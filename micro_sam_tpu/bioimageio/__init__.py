from .model_export import export_sam_model
from .predictor_adaptor import PredictorAdaptor
from .bioengine_export import (
    export_image_encoder, export_onnx_model, export_bioengine_model,
)
