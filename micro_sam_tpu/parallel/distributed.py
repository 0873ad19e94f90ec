"""Multi-host (multi-process) execution: jax.distributed + per-process work
sharding for the precompute fan-out and cross-process data-parallel training.

The reference's only distributed mechanism is single-node DDP gradient
averaging plus a rank-0 broadcast (reference micro_sam/training/
sam_trainer.py:216-228). The TPU-native replacement (SURVEY.md §5) is:

- ``jax.distributed.initialize`` to form the cluster (on Cloud TPU pods the
  coordinator/process topology comes from the TPU environment; on CPU/test
  clusters it is passed explicitly),
- compiler-inserted collectives over ICI (intra-slice) / DCN (multi-slice)
  under a GLOBAL mesh spanning every process's devices,
- an embarrassingly-parallel embedding-precompute fan-out: each process
  encodes its tile shard and writes its own zarr chunks; the coordinator
  stamps the cache signature once all shards have landed.

Tested offline by a 2-process x 4-virtual-CPU-device subprocess cluster
(tests/test_distributed.py) checking precompute output and one training step
numerically equal to the single-process path; `__graft_entry__.dryrun_multichip`
runs the same cluster.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join (or form) the jax.distributed cluster; idempotent.

    With no arguments on a Cloud TPU pod slice, topology is discovered from
    the TPU environment. Explicit arguments (or the MSAM_COORDINATOR /
    MSAM_NUM_PROCESSES / MSAM_PROCESS_ID environment variables) support
    CPU/GPU clusters and tests. Call this before any other jax API in each
    process — backends must not be initialized yet.
    """
    if is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get("MSAM_COORDINATOR")
    if num_processes is None and "MSAM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MSAM_NUM_PROCESSES"])
    if process_id is None and "MSAM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MSAM_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_initialized() -> bool:
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:
        return jax.process_count() > 1


def barrier(name: str) -> None:
    """Block until every process reaches this point (one tiny all-reduce
    over the global device set)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def global_mesh(model_axis: int = 1) -> Mesh:
    """("data", "model") mesh over ALL processes' devices. Process-adjacent
    devices land adjacent on the data axis, so each process's batch shard
    maps onto its own local devices (feeds stay host-local; gradient
    all-reduce rides ICI/DCN)."""
    return make_mesh(jax.devices(), model_axis=model_axis)


def process_tile_ids(n_tiles: int, process_id: Optional[int] = None,
                     process_count: Optional[int] = None) -> List[int]:
    """Round-robin tile assignment: balances the cheaper border tiles across
    processes instead of handing the whole last row to one of them."""
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if process_count is None else process_count
    return list(range(pid, n_tiles, nproc))


def global_batch(local_data: np.ndarray, mesh: Mesh, spec: P = P("data")):
    """Assemble a globally-sharded array from this process's local shard.

    local_data is this process's slice of the global batch (global batch =
    concatenation over process_index order). No data ever crosses hosts —
    jax records the placement and the compiled program addresses only
    device-local shards.
    """
    sharding = NamedSharding(mesh, spec)
    nproc = jax.process_count()
    global_shape = (local_data.shape[0] * nproc,) + tuple(local_data.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data), global_shape=global_shape)


def replicate(value, mesh: Mesh):
    """Host value (identical on every process) -> globally-replicated
    jax.Array. Multi-host jit rejects committed process-local arrays for
    replicated parameters (e.g. the PRNG key), so they are rebuilt here from
    their host bytes; typed PRNG keys round-trip through key_data."""
    import jax.numpy as jnp
    sharding = NamedSharding(mesh, P())
    if hasattr(value, "dtype") and jnp.issubdtype(value.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(value))
        impl = str(jax.random.key_impl(value))
        arr = jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])
        return jax.random.wrap_key_data(arr, impl=impl)
    data = np.asarray(value)
    return jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])


def precompute_image_embeddings_multihost(
    predictor,
    input_: np.ndarray,
    save_path: str,
    tile_shape,
    halo,
    ndim: Optional[int] = None,
    batch_size: int = 1,
    verbose: bool = False,
    mask: Optional[np.ndarray] = None,
    lazy_loading: bool = False,
):
    """Tiled embedding precompute fanned out over the processes of a
    jax.distributed cluster.

    Each process encodes a round-robin shard of the tile grid on its own
    devices and writes those tiles' zarr chunks to the shared ``save_path``
    (the cache layout chunks per tile, utils/zarr_lite). After a barrier,
    process 0 finalizes the cache — the signature/done attrs are stamped
    exactly once — and every process returns the complete ImageEmbeddings
    via the ordinary cache-hit load. Layout and signature are identical to
    the single-process path (tests/test_distributed.py checks equality).

    Replaces nothing in the reference — its precompute is strictly single
    device (reference micro_sam/util.py:764-898).
    """
    from .. import util

    if save_path is None:
        raise ValueError(
            "Multi-host precompute requires a (shared) save_path: processes "
            "exchange their shards through the zarr cache.")
    if tile_shape is None:
        raise ValueError("Multi-host precompute fans out over tiles: pass tile_shape.")

    ndim = input_.ndim if ndim is None else ndim
    halo = tuple(halo) if halo is not None else tuple(0 for _ in tile_shape)
    shape_2d = input_.shape[:2] if ndim == 2 else input_.shape[1:3]
    blocking = util._tile_grid(shape_2d, tuple(tile_shape), halo)
    mask_2d = mask if (mask is None or ndim == 2) else np.max(mask, axis=0)
    all_ids = util._get_tiles_in_mask(blocking, mask_2d)
    mine = set(process_tile_ids(len(all_ids)))
    my_ids = [t for i, t in enumerate(all_ids) if i in mine]

    # phase 1: every process writes its shard (no signature attrs yet)
    util.precompute_image_embeddings(
        predictor, input_, save_path=str(save_path), ndim=ndim,
        tile_shape=tuple(tile_shape), halo=halo, batch_size=batch_size,
        verbose=verbose and jax.process_index() == 0, mask=mask,
        tile_subset=my_ids, finalize=False,
    )
    barrier("msam-precompute-shards")

    # phase 2: the coordinator adopts every shard and stamps the signature
    if jax.process_index() == 0:
        util.precompute_image_embeddings(
            predictor, input_, save_path=str(save_path), ndim=ndim,
            tile_shape=tuple(tile_shape), halo=halo, batch_size=batch_size,
            verbose=False, mask=mask,
        )
    barrier("msam-precompute-done")

    # phase 3: everyone loads the finished cache
    return util.precompute_image_embeddings(
        predictor, input_, save_path=str(save_path), ndim=ndim,
        tile_shape=tuple(tile_shape), halo=halo, verbose=False, mask=mask,
        lazy_loading=lazy_loading,
    )


# ---------------------------------------------------------------------------
# dryrun: one cluster process's body + the spawning orchestrator
# ---------------------------------------------------------------------------

def _dryrun_worker(workdir: str) -> dict:
    """One process's share of the multi-host dryrun: tiled precompute fan-out,
    one deterministic sharded training step, and one epoch of the REAL
    SamTrainer with per-process data feeding. Returns scalars that must agree
    (to float tolerance) with a single-process run of the same work —
    tests/test_distributed.py asserts exactly that."""
    import hashlib

    import optax

    from .. import util
    from ..models.sam import Sam, SamConfig, init_sam_params
    from ..predictor import SamPredictor
    from .mesh import sam_param_shardings
    from .train_step import _opt_state_shardings, make_train_step

    nproc = jax.process_count()
    n_dev = len(jax.devices())
    model_axis = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = global_mesh(model_axis=model_axis)
    data_size = int(mesh.shape["data"])
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    cfg = SamConfig(
        model_type="vit_b", embed_dim=64, depth=2, num_heads=4,
        global_attn_indexes=(1,), window_size=4, img_size=128,
        compute_dtype="float32",
    )
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    sam = Sam(cfg, params)

    # --- 1. tiled precompute fanned out over processes ---
    rng = np.random.RandomState(3)
    image = (rng.rand(300, 300) * 255).astype(np.uint8)
    predictor = SamPredictor(Sam(cfg, params))
    cache = os.path.join(workdir, "emb.zarr")
    if nproc > 1:
        emb = precompute_image_embeddings_multihost(
            predictor, image, cache, tile_shape=(128, 128), halo=(16, 16))
    else:
        emb = util.precompute_image_embeddings(
            predictor, image, save_path=cache, tile_shape=(128, 128),
            halo=(16, 16), verbose=False)
    sha = hashlib.sha1()
    for tid in sorted(emb["features"]):
        feats = np.asarray(emb["features"][tid]["features"], dtype=np.float32)
        sha.update(np.round(feats, 4).tobytes())
    emb_sha = sha.hexdigest()

    # --- 2. one sharded training step on deterministic inputs ---
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    p_shard = sam_param_shardings(params, mesh)
    opt_shard = _opt_state_shardings(opt_state, params, p_shard, mesh)
    params_d = jax.device_put(params, p_shard)
    opt_d = jax.device_put(opt_state, opt_shard)

    B = data_size
    rng = np.random.RandomState(0)
    pixels = (rng.rand(B, 128, 128, 3) * 255).astype(np.float32)
    points = (rng.rand(B, 2, 2) * 128).astype(np.float32)
    labels = np.tile(np.array([[1, -1]], np.int32), (B, 1))
    targets = (rng.rand(B, cfg.embedding_size * 4, cfg.embedding_size * 4) > 0.7
               ).astype(np.float32)

    def shard(a):
        if nproc == 1:
            return jax.device_put(a, data_sh)
        per = B // nproc
        pid = jax.process_index()
        return global_batch(a[pid * per:(pid + 1) * per], mesh)

    step = jax.jit(
        make_train_step(sam, optimizer),
        in_shardings=(p_shard, opt_shard, data_sh, data_sh, data_sh, data_sh),
        out_shardings=(p_shard, opt_shard, repl, (repl, repl)),
    )
    params_d, opt_d, loss, _ = step(
        params_d, opt_d, shard(pixels), shard(points), shard(labels), shard(targets))
    checksum = jax.jit(
        lambda p: sum(jnp_sum_sq(x) for x in jax.tree.leaves(p)),
        in_shardings=(p_shard,), out_shardings=repl,
    )(params_d)

    # --- 3. the REAL trainer, one epoch, per-process data feeding ---
    from ..training.sam_trainer import SamTrainer
    from ..training.trainable_sam import TrainableSAM
    rng = np.random.RandomState(7)
    g_imgs = (rng.rand(data_size, 128, 128, 3) * 255).astype(np.float32)
    g_lbls = np.zeros((data_size, 128, 128), np.int64)
    for b in range(data_size):
        for i in range(3):
            y, x = rng.randint(0, 100, 2)
            g_lbls[b, y:y + 24, x:x + 24] = i + 1
    per = data_size // nproc
    pid = jax.process_index()
    loader = [(g_imgs[pid * per:(pid + 1) * per], g_lbls[pid * per:(pid + 1) * per])]
    trainer = SamTrainer(
        name="mh-dryrun", train_loader=loader, val_loader=loader,
        model=TrainableSAM(Sam(cfg, init_sam_params(jax.random.PRNGKey(1), cfg))),
        n_sub_iteration=2, n_objects_per_batch=2, seed=0,
        save_root=os.path.join(workdir, "ckpt"), mesh=mesh,
    )
    trainer.fit(epochs=1, verbose=False)
    trainer_loss = float(trainer.train_metrics[0]["train_loss"])
    ckpt = os.path.join(workdir, "ckpt", "mh-dryrun", "latest.pkl")

    # post-epoch trainer params: multi-host shard feeding must land on the
    # SAME weights as single-process full-batch feeding (the per-sample
    # prompt seeding in SamTrainer._prepare_batch is what guarantees it)
    from jax.experimental import multihost_utils
    t_params = trainer.model.params
    if nproc > 1:
        t_params = multihost_utils.process_allgather(t_params, tiled=True)
    trainer_param_checksum = float(sum(
        float(np.sum(np.asarray(x, np.float64) ** 2))
        for x in jax.tree.leaves(t_params)))

    # the coordinator-written checkpoint must carry those same weights
    ckpt_checksum = None
    if os.path.exists(ckpt):
        import pickle
        with open(ckpt, "rb") as f:
            state = pickle.load(f)
        ckpt_checksum = float(sum(
            float(np.sum(np.asarray(x, np.float64) ** 2))
            for x in jax.tree.leaves(state["model_state"])))

    # --- 4. multi-host AMG: the production decode path over the global mesh
    from ..instance_segmentation import AutomaticMaskGenerator
    amg_pred = SamPredictor(Sam(cfg, params)).shard_on_mesh(mesh)
    rng = np.random.RandomState(11)
    amg_img = np.zeros((128, 128), np.uint8)
    for i in range(4):
        y, x = rng.randint(10, 100, 2)
        amg_img[y:y + 20, x:x + 20] = 120 + 30 * i
    amg = AutomaticMaskGenerator(
        amg_pred, points_per_side=4, points_per_batch=2 * data_size,
        prefilter_thresholds=(0.0, 0.0))
    amg.initialize(amg_img)
    records = amg.generate(pred_iou_thresh=0.0, stability_score_thresh=0.0,
                           box_nms_thresh=0.9, output_mode="rle")
    sha = hashlib.sha1()
    for rec in records:
        sha.update(np.asarray(rec["segmentation"]["counts"], np.int64).tobytes())
        sha.update(np.round(np.float64(rec["predicted_iou"]), 5).tobytes())
    amg_sha = sha.hexdigest()

    barrier("msam-dryrun-done")

    return {
        "nproc": nproc, "n_devices": n_dev,
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "emb_sha": emb_sha, "step_loss": float(loss),
        "param_checksum": float(checksum),
        "trainer_loss": trainer_loss,
        "trainer_param_checksum": trainer_param_checksum,
        "ckpt_checksum": ckpt_checksum,
        "amg_sha": amg_sha,
        "checkpoint_written": os.path.exists(ckpt),
    }


def jnp_sum_sq(x):
    import jax.numpy as jnp
    return jnp.sum(jnp.asarray(x, jnp.float32) ** 2)


def _worker_main(argv: Sequence[str]) -> None:
    """python -m micro_sam_tpu.parallel.distributed <workdir> <out.json>

    Cluster topology from MSAM_COORDINATOR / MSAM_NUM_PROCESSES /
    MSAM_PROCESS_ID (absent -> single-process)."""
    import json
    workdir, out_path = argv[0], argv[1]
    if os.environ.get("MSAM_NUM_PROCESSES"):
        initialize()
    result = _dryrun_worker(workdir)
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[distributed dryrun] process {jax.process_index()}: {result}")


def dryrun_multihost(n_devices: int = 8, n_processes: int = 2,
                     timeout: int = 1800) -> dict:
    """Spawn an n_processes CPU cluster (n_devices total virtual devices),
    run _dryrun_worker in each, and check the results agree with a
    single-process run over the same global device count. This is the
    offline stand-in for a multi-host TPU pod slice."""
    import json
    import socket
    import subprocess
    import sys
    import tempfile

    assert n_devices % n_processes == 0
    per_proc = n_devices // n_processes

    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()

    def env_for(pid: Optional[int], dev_count: int) -> dict:
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dev_count}"
        if pid is not None:
            env["MSAM_COORDINATOR"] = f"localhost:{port}"
            env["MSAM_NUM_PROCESSES"] = str(n_processes)
            env["MSAM_PROCESS_ID"] = str(pid)
        return env

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        # single-process baseline over the full device count
        single_out = os.path.join(tmp, "single.json")
        single_dir = os.path.join(tmp, "single")
        os.makedirs(single_dir)
        r = subprocess.run(
            [sys.executable, "-m", "micro_sam_tpu.parallel.distributed",
             single_dir, single_out],
            env=env_for(None, n_devices), cwd=repo, capture_output=True,
            text=True, timeout=timeout)
        if r.returncode != 0:
            raise RuntimeError(f"single-process dryrun failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
        results["single"] = json.load(open(single_out))

        # the cluster
        cluster_dir = os.path.join(tmp, "cluster")
        os.makedirs(cluster_dir)
        procs = []
        outs = []
        for pid in range(n_processes):
            out = os.path.join(tmp, f"proc{pid}.json")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "micro_sam_tpu.parallel.distributed",
                 cluster_dir, out],
                env=env_for(pid, per_proc), cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
        logs = [p.communicate(timeout=timeout) for p in procs]
        for pid, (p, (so, se)) in enumerate(zip(procs, logs)):
            if p.returncode != 0:
                raise RuntimeError(
                    f"cluster process {pid} failed:\n{so[-2000:]}\n{se[-2000:]}")
        results["cluster"] = [json.load(open(o)) for o in outs]

    single, cluster = results["single"], results["cluster"]
    assert all(c["emb_sha"] == single["emb_sha"] for c in cluster), \
        "multi-host precompute differs from single-process"
    for c in cluster:
        assert abs(c["step_loss"] - single["step_loss"]) < 1e-4, \
            (c["step_loss"], single["step_loss"])
        assert abs(c["param_checksum"] - single["param_checksum"]) \
            / max(abs(single["param_checksum"]), 1.0) < 1e-5
        # the REAL SamTrainer: shard-fed cluster epoch == full-batch
        # single-process epoch (per-sample prompt seeding makes the global
        # batch identical; the step program is the same SPMD program)
        assert abs(c["trainer_loss"] - single["trainer_loss"]) < 1e-4, \
            (c["trainer_loss"], single["trainer_loss"])
        assert abs(c["trainer_param_checksum"] - single["trainer_param_checksum"]) \
            / max(abs(single["trainer_param_checksum"]), 1.0) < 1e-5, \
            (c["trainer_param_checksum"], single["trainer_param_checksum"])
        assert c["amg_sha"] == single["amg_sha"], \
            "multi-host AMG differs from single-process"
    assert cluster[0]["checkpoint_written"]
    # the coordinator-written checkpoint carries the same weights a
    # single-process run writes
    assert cluster[0]["ckpt_checksum"] is not None
    assert abs(cluster[0]["ckpt_checksum"] - single["ckpt_checksum"]) \
        / max(abs(single["ckpt_checksum"]), 1.0) < 1e-5, \
        (cluster[0]["ckpt_checksum"], single["ckpt_checksum"])
    print(f"dryrun_multihost: {n_processes} processes x {per_proc} devices == "
          f"single-process ({n_devices} devices): precompute sha match, "
          f"step loss {single['step_loss']:.6f}, trainer loss "
          f"{single['trainer_loss']:.6f} == cluster, AMG sha match, "
          f"checkpoint checksum match")
    return results


if __name__ == "__main__":
    import sys as _sys
    _worker_main(_sys.argv[1:])
