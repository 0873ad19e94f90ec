"""Cross-framework parity: JAX forward vs an independent torch implementation
of the official SAM semantics, sharing weights via the exported state dict.

This is the strongest parity evidence available offline (no zoo checkpoints
downloadable): two independent implementations of the SAM math agreeing on the
same weights implies the converter layout and the JAX forward are correct.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def shared_weights(tiny_sam):
    from micro_sam_tpu.models.convert import export_torch_state_dict
    sd_np = export_torch_state_dict(tiny_sam.params, tiny_sam.config)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)).float() for k, v in sd_np.items()}
    return sd


@pytest.mark.slow
def test_encoder_parity(tiny_sam, shared_weights):
    import jax.numpy as jnp
    from micro_sam_tpu.models.sam import preprocess
    from torch_sam_ref import image_encoder

    cfg = tiny_sam.config
    rng = np.random.RandomState(0)
    image = rng.rand(1, cfg.img_size, cfg.img_size, 3).astype(np.float32) * 255

    px = preprocess(jnp.asarray(image), cfg.img_size)
    emb_jax = np.asarray(tiny_sam.encode_image(tiny_sam.params, px))

    px_t = torch.from_numpy(np.asarray(px)).permute(0, 3, 1, 2)
    with torch.no_grad():
        emb_torch = image_encoder(
            shared_weights, px_t, depth=cfg.depth, num_heads=cfg.num_heads,
            window_size=cfg.window_size, global_idx=set(cfg.global_attn_indexes),
        ).permute(0, 2, 3, 1).numpy()

    err = np.abs(emb_jax - emb_torch).max()
    assert err < 5e-4, f"encoder parity error {err}"


@pytest.mark.slow
def test_decoder_parity(tiny_sam, shared_weights):
    import jax.numpy as jnp
    from micro_sam_tpu.models import prompt_encoder as pe
    from torch_sam_ref import dense_pe, embed_points, mask_decoder

    cfg = tiny_sam.config
    e = cfg.embedding_size
    rng = np.random.RandomState(1)
    feats = rng.randn(1, e, e, 256).astype(np.float32) * 0.5
    points = np.array([[[100.0, 120.0], [40.0, 60.0], [0.0, 0.0]]], np.float32)
    labels = np.array([[1, 0, -1]], np.int32)

    masks_jax, iou_jax = tiny_sam.decode_masks(
        tiny_sam.params, jnp.asarray(feats), jnp.asarray(points), jnp.asarray(labels)
    )
    masks_jax, iou_jax = np.asarray(masks_jax), np.asarray(iou_jax)

    with torch.no_grad():
        sparse = embed_points(
            shared_weights,
            torch.from_numpy(points),
            torch.from_numpy(labels.astype(np.int64)),
            (cfg.img_size, cfg.img_size),
        )
        pe_t = dense_pe(shared_weights, (e, e))
        masks_t, iou_t = mask_decoder(
            shared_weights,
            torch.from_numpy(feats).permute(0, 3, 1, 2),
            pe_t,
            sparse,
            torch.zeros(1, 256, e, e)
            + shared_weights["prompt_encoder.no_mask_embed.weight"][0][None, :, None, None],
        )
    err_m = np.abs(masks_jax - masks_t.numpy()).max()
    err_i = np.abs(iou_jax - iou_t.numpy()).max()
    assert err_m < 5e-4, f"mask parity error {err_m}"
    assert err_i < 5e-4, f"iou parity error {err_i}"


def test_end_to_end_mask_parity(tiny_sam, shared_weights, synthetic_image):
    """Same image + same point prompt -> same binary mask via both stacks."""
    import jax.numpy as jnp
    from micro_sam_tpu.models.sam import preprocess
    from micro_sam_tpu.predictor import SamPredictor
    from torch_sam_ref import dense_pe, embed_points, image_encoder, mask_decoder
    import torch.nn.functional as F

    cfg = tiny_sam.config
    image, _ = synthetic_image
    from micro_sam_tpu.util import _to_image
    image = _to_image(image)

    predictor = SamPredictor(tiny_sam)
    predictor.set_image(image)
    masks_jax, scores, low = predictor.predict(
        point_coords=np.array([[120.0, 130.0]]), point_labels=np.array([1]),
    )

    px = np.asarray(preprocess(jnp.asarray(image[None].astype(np.float32)), cfg.img_size))
    with torch.no_grad():
        emb = image_encoder(
            shared_weights, torch.from_numpy(px).permute(0, 3, 1, 2),
            depth=cfg.depth, num_heads=cfg.num_heads,
            window_size=cfg.window_size, global_idx=set(cfg.global_attn_indexes),
        )
        pts = torch.tensor([[[120.0, 130.0], [0.0, 0.0]]])
        lbl = torch.tensor([[1, -1]])
        sparse = embed_points(shared_weights, pts, lbl, (cfg.img_size, cfg.img_size))
        e = cfg.embedding_size
        dense = torch.zeros(1, 256, e, e) + \
            shared_weights["prompt_encoder.no_mask_embed.weight"][0][None, :, None, None]
        masks_t, iou_t = mask_decoder(shared_weights, emb, dense_pe(shared_weights, (e, e)),
                                      sparse, dense)
        up = F.interpolate(masks_t, (cfg.img_size, cfg.img_size), mode="bilinear",
                           align_corners=False)
        up = F.interpolate(up, image.shape[:2], mode="bilinear", align_corners=False)
        masks_torch = (up[0, 1:] > 0).numpy()

    agree = (masks_jax == masks_torch).mean()
    assert agree > 0.999, f"binary masks agree on only {agree:.4%} of pixels"
