"""Round-2 feature walkthrough: automatic tracking with the learned linker
and parameter-efficient finetuning with an int4-quantized base.

Runs end to end on CPU with a random-initialized tiny model (no downloads).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the container pins axon; force CPU

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")


def tracking_with_learned_linker():
    """Track a synthetic timeseries with the learned association model
    (Trackastra-class linking without the external torch dependency)."""
    from micro_sam_tpu.learned_tracking import (
        LearnedTracker, synthetic_tracking_sequence, train_default_linker,
        save_linker,
    )
    from micro_sam_tpu.multi_dimensional_segmentation import track_across_frames

    # train the link scorer on generated motion data (or load shipped weights)
    params = train_default_linker(n_sequences=4, n_steps=400, verbose=True)
    save_linker("/tmp/linker.npz", params)

    images, segs, _ = synthetic_tracking_sequence(n_frames=8, n_objects=5, seed=1)
    tracker = LearnedTracker.from_pretrained("/tmp/linker.npz")
    tracked, lineages = track_across_frames(
        images, segs, verbose=False, tracker=tracker)
    print(f"tracked {len(lineages)} lineages over {tracked.shape[0]} frames")


def quantized_lora_finetune_setup():
    """LoRA finetuning setup with the frozen base stored as native int4."""
    from micro_sam_tpu.models.peft_sam import apply_peft, get_peft_mask
    from micro_sam_tpu.models.sam import Sam, SamConfig, init_sam_params

    cfg = SamConfig(model_type="vit_b", embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), img_size=128)
    sam = Sam(cfg, init_sam_params(jax.random.PRNGKey(0), cfg))

    params = apply_peft(sam.params, cfg, rank=4, peft_module="lora",
                        quantize=True)
    mask = get_peft_mask(params, "lora")

    q = params["image_encoder"]["blocks"][0]["attn"]["qkv"]
    print("base weight storage:", q["w_q4"].dtype, q["w_q4"].shape,
          "scales:", q["w_scale"].dtype)
    n_train = sum(bool(m) for m in jax.tree.leaves(mask))
    print(f"trainable leaves: {n_train}/{len(jax.tree.leaves(mask))}")

    # the forward dequantizes on the fly; training uses the standard
    # train_sam(...) entry with peft_kwargs={"quantize": True, ...}
    from micro_sam_tpu.models.sam import preprocess
    emb = sam.encode_image(params, preprocess(
        np.zeros((1, 128, 128, 3), "float32") + 0.5, cfg.img_size))
    print("quantized forward:", np.asarray(emb).shape)


if __name__ == "__main__":
    tracking_with_learned_linker()
    quantized_lora_finetune_setup()
