from .rectified_flow import RectifiedFlow
from .pipeline import TransferPipeline
