from far_tpu.utils.config import FARConfig, default_config
