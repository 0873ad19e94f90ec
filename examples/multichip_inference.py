"""Multi-chip inference through the PRODUCTION APIs.

The mesh is not a separate code path: build the predictor with a device mesh
and every public API — precompute (flat or tiled), interactive predict, AMG —
fans out over the chips (data-parallel batches, tensor-parallel encoder
matmuls, XLA-inserted collectives over ICI).

Run on a multi-chip host, or locally on a virtual mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_inference.py
"""
import numpy as np


def main():
    import jax
    from micro_sam_tpu.instance_segmentation import AutomaticMaskGenerator
    from micro_sam_tpu.parallel.mesh import make_mesh
    from micro_sam_tpu.util import (
        get_sam_model, precompute_image_embeddings, set_precomputed)

    devices = jax.devices()
    print(f"{len(devices)} devices:", {d.platform for d in devices})
    mesh = make_mesh(devices, model_axis=2 if len(devices) % 2 == 0 else 1)
    print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

    # one argument turns the whole stack multi-chip
    predictor = get_sam_model(model_type="vit_b_lm", mesh=mesh)

    rng = np.random.RandomState(0)
    image = (rng.rand(2048, 2048) * 255).astype(np.uint8)

    # tiled precompute: tile batches shard the mesh data axis
    embeddings = precompute_image_embeddings(
        predictor, image, tile_shape=(1024, 1024), halo=(128, 128),
        batch_size=mesh.shape["data"], verbose=True,
    )

    # interactive decode and AMG ride the same sharded programs
    set_precomputed(predictor, embeddings, tile_id=0)
    masks, scores, _ = predictor.predict(
        point_coords=np.array([[256.0, 256.0]]), point_labels=np.array([1]))
    print("predict:", masks.shape, float(scores.max()))

    small = (rng.rand(512, 512) * 255).astype(np.uint8)
    emb_small = precompute_image_embeddings(predictor, small, verbose=False)
    amg = AutomaticMaskGenerator(predictor, points_per_side=8)
    amg.initialize(small, emb_small)
    seg = amg.generate(pred_iou_thresh=0.7)
    print("AMG instances:", int(seg.max()))


if __name__ == "__main__":
    main()
