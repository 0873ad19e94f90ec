from .sam_trainer import SamTrainer
from .joint_sam_trainer import JointSamTrainer
from .semantic_sam_trainer import SemanticSamTrainer, SemanticMapsSamTrainer
from .simple_sam_trainer import SimpleSamTrainer, MedSAMTrainer
from .trainable_sam import TrainableSAM
from .util import ConvertToSamInputs, ConvertToSemanticSamInputs, get_trainable_sam_model
from .training import (
    train_sam, train_sam_for_configuration, train_instance_segmentation,
    default_sam_dataset, default_sam_loader, CONFIGURATIONS,
    export_instance_segmentation_model,
)
