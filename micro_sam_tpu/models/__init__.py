from .build_sam import (
    sam_model_registry, build_sam_params, SamConfig,
    build_sam_vit_b, build_sam_vit_l, build_sam_vit_h,
)
from .sam import Sam
from . import peft_sam
from . import sam_3d_wrapper
from . import simple_sam_3d_wrapper
