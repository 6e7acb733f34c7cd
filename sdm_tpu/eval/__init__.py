"""Sample-quality evaluation — a TPU-build subsystem beyond the reference.

The reference ships no quantitative sample-quality tooling at all (SURVEY.md
§6: no FID, no benchmark numbers; quality was judged by eye from the preview
grids train_diffusion.py:402-449 writes). This package supplies the standard
generative-model metrics so converged models CAN be scored:

  fid.py       Frechet distance + kernel (KID/MMD^2) distance between
               feature sets, numpy/JAX only (no scipy dependency).
  features.py  Feature extractors: raw-pixel statistics, a fixed-seed random
               conv net (runs on TPU via jit), and an optional user-supplied
               torch module (e.g. a locally available InceptionV3) for
               literature-comparable FID.

CLI: evaluate_samples.py (sdm_tpu/cli/evaluate_samples.py).
"""

from sdm_tpu.eval.fid import (frechet_distance, gaussian_stats,
                              kernel_distance)
from sdm_tpu.eval.features import make_feature_extractor

__all__ = ["frechet_distance", "gaussian_stats", "kernel_distance",
           "make_feature_extractor"]
