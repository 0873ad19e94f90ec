"""Finetune SAM and export the result as a bioimage.io package.

Runnable-script port of the reference's notebooks/sam_finetuning.ipynb: a
short finetuning run (train_sam on synthetic data — point at real
images/labels for actual use), then ``export_sam_model`` packages the
finetuned checkpoint with a round-trip test so it can be shared or served.
"""
import argparse
import os

from micro_sam_tpu.bioimageio import export_sam_model
from micro_sam_tpu.sample_data import synthetic_data
from micro_sam_tpu.training import default_sam_loader, train_sam


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_type", default="vit_b")
    parser.add_argument("--name", default="sam-finetuned-export")
    parser.add_argument("--save_root", default="./checkpoints")
    parser.add_argument("--output", default="./sam_finetuned.zip")
    parser.add_argument("--epochs", type=int, default=1)
    args = parser.parse_args()

    images, labels = [], []
    for seed in range(4):
        im, seg = synthetic_data((512, 512), seed=seed)
        images.append(im)
        labels.append(seg)

    loader_kwargs = dict(
        raw_key=None, label_key=None, patch_shape=(512, 512),
        with_segmentation_decoder=False, batch_size=1, n_samples=2,
    )
    train_loader = default_sam_loader(
        raw_paths=images[:3], label_paths=labels[:3], **loader_kwargs)
    val_loader = default_sam_loader(
        raw_paths=images[3:], label_paths=labels[3:], **loader_kwargs)

    train_sam(
        name=args.name, model_type=args.model_type,
        train_loader=train_loader, val_loader=val_loader,
        n_epochs=args.epochs, n_objects_per_batch=5,
        with_segmentation_decoder=False, save_root=args.save_root,
    )
    checkpoint = os.path.join(args.save_root, args.name, "best.pkl")

    # package the finetuned model (includes an offline round-trip test of the
    # exported weights against the live predictor)
    export_sam_model(
        image=images[-1], label_image=labels[-1],
        model_type=args.model_type, name=args.name,
        output_path=args.output, checkpoint_path=checkpoint,
    )
    print("exported", args.output)


if __name__ == "__main__":
    main()
