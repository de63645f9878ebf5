from .checkpoint import (available_steps, restore_checkpoint,
                         save_checkpoint)
from .logging import MetricsLogger
