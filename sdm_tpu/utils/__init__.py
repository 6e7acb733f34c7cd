from sdm_tpu.utils.logging_setup import setup_logging
from sdm_tpu.utils.progress import print_progress_bar
