from .rectified_flow import RectifiedFlow
from .edm import EDM
from .factory import make_model
from .pipeline import TransferPipeline
