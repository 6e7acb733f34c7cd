"""CLI parity with /root/reference/create_diffusion_config.py."""
from sdm_tpu.cli.config_wizards import create_diffusion_config


def run():
    create_diffusion_config()


if __name__ == "__main__":
    run()
