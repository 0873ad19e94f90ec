"""Mesh-sharded SAM training step (dp over batch x tp over encoder hidden dims).

The full training step — encoder forward, prompt decode, SAM-style loss (dice
over mask logits + IoU-regression MSE, cf. reference sam_trainer._compute_loss),
backward and optax update — compiled as ONE jit program over a Mesh. Gradients
all-reduce over the data axis and the tensor-sharded matmuls all-reduce over the
model axis, both inserted by XLA's SPMD partitioner.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sam import Sam, SamConfig, init_sam_params, preprocess
from .mesh import make_mesh, sam_param_shardings


def dice_loss(pred_logits: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Soft dice over sigmoid(logits); reduces over spatial dims, mean over rest."""
    pred = jax.nn.sigmoid(pred_logits)
    num = 2.0 * jnp.sum(pred * target, axis=(-2, -1))
    den = jnp.sum(pred * pred, axis=(-2, -1)) + jnp.sum(target * target, axis=(-2, -1))
    return jnp.mean(1.0 - num / (den + eps))


def make_train_step(sam: Sam, optimizer):
    """Build the pure training-step function (jit it with shardings)."""

    def loss_fn(params, pixels, points, labels, target_masks):
        feats = sam.encode_image(params, preprocess(pixels, sam.config.img_size))
        mask_logits, iou_pred = sam.decode_masks(params, feats, points, labels)
        # min-over-multimask dice (reference trainer takes the best of 3)
        d = jax.vmap(lambda m: dice_loss(m, target_masks), in_axes=1)(mask_logits[:, 1:])
        mask_loss = jnp.min(d)
        # iou regression towards actual dice overlap of the first mask
        pred_bin = (mask_logits[:, 1:] > 0).astype(jnp.float32)
        inter = jnp.sum(pred_bin * target_masks[:, None], axis=(-2, -1))
        union = jnp.sum(jnp.maximum(pred_bin, target_masks[:, None]), axis=(-2, -1))
        actual_iou = inter / (union + 1e-7)
        iou_loss = jnp.mean((iou_pred[:, 1:] - jax.lax.stop_gradient(actual_iou)) ** 2)
        return mask_loss + iou_loss, (mask_loss, iou_loss)

    def train_step(params, opt_state, pixels, points, labels, target_masks):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pixels, points, labels, target_masks
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return train_step


def dryrun_training_step(devices: Sequence) -> None:
    """One sharded training step on tiny shapes over an n-device mesh."""
    n = len(devices)
    model_axis = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_mesh(devices, model_axis=model_axis)
    data_size = n // model_axis

    cfg = SamConfig(
        model_type="vit_b", embed_dim=64, depth=2, num_heads=4,
        global_attn_indexes=(1,), window_size=4, img_size=128,
        compute_dtype="float32",
    )
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)

    optimizer = optax.adamw(1e-5)
    opt_state = optimizer.init(params)

    p_shard = sam_param_shardings(params, mesh)
    # optimizer state mirrors param shardings on its param-structured leaves
    opt_shard = _opt_state_shardings(opt_state, params, p_shard, mesh)

    data_spec = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    B = data_size  # one sample per data-shard
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.rand(B, cfg.img_size, cfg.img_size, 3).astype(np.float32) * 255)
    points = jnp.asarray(rng.rand(B, 2, 2).astype(np.float32) * cfg.img_size)
    labels = jnp.asarray(np.tile(np.array([[1, -1]], np.int32), (B, 1)))
    targets = jnp.asarray(
        (rng.rand(B, cfg.embedding_size * 4, cfg.embedding_size * 4) > 0.7).astype(np.float32)
    )

    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, opt_shard)
    pixels = jax.device_put(pixels, data_spec)
    points = jax.device_put(points, data_spec)
    labels = jax.device_put(labels, data_spec)
    targets = jax.device_put(targets, data_spec)

    step = jax.jit(
        make_train_step(sam, optimizer),
        in_shardings=(p_shard, opt_shard, data_spec, data_spec, data_spec, data_spec),
        out_shardings=(p_shard, opt_shard, repl, (repl, repl)),
        donate_argnums=(0, 1),
    )
    params, opt_state, loss, (mask_loss, iou_loss) = step(
        params, opt_state, pixels, points, labels, targets
    )
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(f"dryrun_training_step: mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"loss={loss:.4f} mask={float(mask_loss):.4f} iou={float(iou_loss):.4f}")


def dryrun_production(devices: Sequence) -> None:
    """Drive the PRODUCTION multi-chip paths on an n-device mesh, tiny shapes.

    Unlike dryrun_training_step (a minimal sharded loss), this exercises the
    real user-facing APIs exactly as a multi-chip user calls them:

    1. SamTrainer(mesh=...) — the full iterative-prompting trainer, one epoch
       with batch = data-axis size (encoder fwd, corrective scan, backward,
       optax update, all SPMD over the mesh).
    2. SamPredictor.shard_on_mesh + util.precompute_image_embeddings — the
       tiled precompute fan-out over the data axis, checked numerically
       against the single-device path.
    """
    import numpy as np
    from ..models.sam import SamConfig, init_sam_params, Sam
    from ..predictor import SamPredictor
    from ..training.trainable_sam import TrainableSAM
    from ..training.sam_trainer import SamTrainer
    from .. import util

    n = len(devices)
    model_axis = 2 if n % 2 == 0 and n > 1 else 1
    mesh = make_mesh(devices, model_axis=model_axis)
    data_size = n // model_axis

    cfg = SamConfig(
        model_type="vit_b", embed_dim=64, depth=2, num_heads=4,
        global_attn_indexes=(1,), window_size=4, img_size=128,
        compute_dtype="float32",
    )

    # --- 1. the real trainer, sharded ---
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    model = TrainableSAM(Sam(cfg, params))
    rng = np.random.RandomState(0)
    imgs = (rng.rand(data_size, 128, 128, 3) * 255).astype(np.float32)
    labels = np.zeros((data_size, 128, 128), np.int64)
    for b in range(data_size):  # a few square objects per image
        for i in range(3):
            y, x = rng.randint(0, 100, 2)
            labels[b, y:y + 24, x:x + 24] = i + 1
    loader = [(imgs, labels)]
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        trainer = SamTrainer(
            name="dryrun", train_loader=loader, val_loader=loader,
            model=model, n_sub_iteration=2, n_objects_per_batch=2,
            save_root=tmp, mesh=mesh,
        )
        trainer.fit(epochs=1, verbose=False)
        loss = trainer.train_metrics[0]["train_loss"]
        assert np.isfinite(loss), f"non-finite sharded train loss {loss}"

    # --- 2. the real tiled precompute, sharded vs single-device ---
    params = init_sam_params(jax.random.PRNGKey(1), cfg)
    image = (rng.rand(200, 200) * 255).astype(np.uint8)

    single = SamPredictor(Sam(cfg, params))
    ref = util.precompute_image_embeddings(
        single, image, tile_shape=(128, 128), halo=(16, 16), verbose=False)

    meshed = SamPredictor(Sam(cfg, params), mesh=mesh)
    got = util.precompute_image_embeddings(
        meshed, image, tile_shape=(128, 128), halo=(16, 16), verbose=False,
        batch_size=data_size)
    for tile_id, entry in ref["features"].items():
        a = np.asarray(entry["features"])
        b = np.asarray(got["features"][tile_id]["features"])
        err = np.abs(a - b).max()
        assert err < 1e-4, f"tile {tile_id}: sharded vs single mismatch {err}"

    # --- 3. sharded interactive decode through the public predict API ---
    meshed.set_image(np.stack([image] * 3, axis=-1))
    masks, iou, _ = meshed.predict(
        point_coords=np.array([[100.0, 100.0]]), point_labels=np.array([1]))
    assert masks.shape[-2:] == image.shape

    print(f"dryrun_production: mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"trainer loss={loss:.4f}, tiled precompute sharded==single, predict ok")


def _opt_state_shardings(opt_state, params, p_shard, mesh):
    """Optimizer-state subtrees that mirror the param tree (adam mu/nu) get the
    param shardings; everything else (counters, scalars) is replicated."""
    repl = NamedSharding(mesh, P())
    pdef = jax.tree.structure(params)
    flat_shard = jax.tree.leaves(p_shard, is_leaf=lambda x: isinstance(x, NamedSharding))

    def rec(node):
        try:
            if jax.tree.structure(node) == pdef:
                return jax.tree.unflatten(pdef, flat_shard)
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple state
            return type(node)(*[rec(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(x) for x in node)
        return jax.tree.map(lambda _: repl, node)

    return rec(opt_state)
