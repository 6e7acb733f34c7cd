"""CLI parity with /root/reference/train_SR_diffusion.py: same flags
(--config-path/--device), same training-config JSON schema, same checkpoint
and plot outputs — driving the shared TPU training loop (sdm_tpu/train/loop.py)."""

from sdm_tpu.train.loop import main, SR_SPEC


def run(raw_args=None):
    return main(SR_SPEC, raw_args)


if __name__ == "__main__":
    run()
