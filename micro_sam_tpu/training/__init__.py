from .sam_trainer import SamTrainer, SamLogger
from .joint_sam_trainer import JointSamTrainer, JointSamLogger
from .semantic_sam_trainer import CustomDiceLoss, SemanticSamTrainer, SemanticMapsSamTrainer
from .simple_sam_trainer import SimpleSamTrainer, MedSAMTrainer
from .trainable_sam import TrainableSAM
from .util import (
    ConvertToSamInputs, ConvertToSemanticSamInputs, get_trainable_sam_model,
    identity, get_raw_transform, ResizeRawTrafo, ResizeLabelTrafo,
)
from .training import (
    train_sam, train_sam_for_configuration, train_instance_segmentation,
    default_sam_dataset, default_sam_loader, CONFIGURATIONS,
    export_instance_segmentation_model,
)
