from .build_sam import sam_model_registry, build_sam_params, SamConfig
from .sam import Sam
