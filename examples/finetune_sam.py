"""Finetune SAM on custom (here: synthetic) data with the iterative
prompt-sampling loop + joint segmentation decoder training.

Mirrors the reference's finetuning workflow (train_sam); for real data pass
image/label paths to default_sam_loader.
"""
import numpy as np

from micro_sam_tpu.sample_data import synthetic_data
from micro_sam_tpu.training import default_sam_loader, train_sam


def main():
    images, labels = [], []
    for seed in range(4):
        im, seg = synthetic_data((512, 512), seed=seed)
        images.append(im)
        labels.append(seg)

    loader_kwargs = dict(
        raw_key=None, label_key=None, patch_shape=(512, 512),
        with_segmentation_decoder=True, batch_size=1, n_samples=4,
    )
    train_loader = default_sam_loader(raw_paths=images[:3], label_paths=labels[:3], **loader_kwargs)
    val_loader = default_sam_loader(raw_paths=images[3:], label_paths=labels[3:], **loader_kwargs)

    train_sam(
        name="sam-finetuned",
        model_type="vit_b",
        train_loader=train_loader,
        val_loader=val_loader,
        n_epochs=1,
        n_objects_per_batch=10,
        with_segmentation_decoder=True,
        save_root="./checkpoints",
    )


if __name__ == "__main__":
    main()
