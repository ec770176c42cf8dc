from deepim_tpu.utils.logger import create_logger, logger, set_logger_dir  # noqa: F401
from deepim_tpu.utils.speedometer import Speedometer  # noqa: F401
