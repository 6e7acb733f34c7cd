"""Production serving for exported diffusion bundles — beyond the reference.

The reference's only inference path is a batch CLI that reloads checkpoints,
rebuilds the model, and re-enters a Python sampling loop on every invocation
(generate_images_diffusion.py:152-254). This package keeps everything
resident instead:

  engine.py  SamplerEngine — loads a bundle ONCE, keeps params on device,
             compiles the full ensemble sampling chain ONCE at a fixed
             batch shape (whole trajectory per model = one lax.scan), and
             serves padded fixed-shape batches from then on. First request
             pays the compile; steady state is pure device time.
  server.py  DiffusionServer — stdlib ThreadingHTTPServer front-end with a
             single device-worker thread and request micro-batching:
             concurrent /generate requests coalesce into one padded batch
             per trajectory (continuous-batching style), so K small
             requests cost ~1 batch of device time, not K.

CLI: serve_diffusion.py.
"""

from sdm_tpu.serving.engine import SamplerEngine
from sdm_tpu.serving.server import DiffusionServer

__all__ = ["SamplerEngine", "DiffusionServer"]
