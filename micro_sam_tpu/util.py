"""Core runtime: model registry/loading, device handling, embedding precompute & cache.

TPU-native rebuild of micro_sam/util.py (reference L1, SURVEY.md §1). The
embedding precompute is the throughput workhorse (reference call stack §3.1):
tiles/z-slices are batched into a single jitted encoder program; cache writes
overlap with device compute via a thread pool; the cache is a zarr-v2
compatible store (utils/zarr_lite) carrying the same signature attributes as
the reference (data_signature, tile_shape/halo, model_type, ...) so caches are
mutually intelligible.
"""
from __future__ import annotations

import hashlib
import os
import warnings
from concurrent import futures
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import __version__
from .models.build_sam import get_config, SAM_CONFIGS, _validate_model_type
from .models.sam import Sam, SamConfig, init_sam_params
from .models.convert import load_torch_checkpoint, normalize_state_dict, convert_sam_state_dict
from .predictor import SamPredictor
from .utils import zarr_lite
from .utils.blocking import Blocking
from .utils.transforms import get_preprocess_shape

# ImageEmbeddings: {"features": array or group, "input_size": ..., "original_size": ...}
ImageEmbeddings = Dict[str, Any]

_DEFAULT_MODEL = "vit_b_lm"


# -----------------------------------------------------------------------------
# Cache directory & registry
# -----------------------------------------------------------------------------

def microsam_cachedir() -> str:
    """Cache dir; override with MICROSAM_CACHEDIR (reference util.py:62-86)."""
    cache_dir = os.environ.get("MICROSAM_CACHEDIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "micro_sam_tpu"
    )
    return cache_dir


def get_cache_directory() -> str:
    """The micro-sam cache directory (reference util.py:62); honors the
    MICROSAM_CACHEDIR environment variable."""
    return microsam_cachedir()


# Known xxh128 content hashes of the zoo checkpoints (same artifacts the
# reference distributes; values from micro_sam/util.py:102-141). Used to
# validate locally cached model files before loading.
_MODEL_HASHES: Dict[str, str] = {
    "vit_l": "xxh128:a82beb3c660661e3dd38d999cc860e9a",
    "vit_h": "xxh128:97698fac30bd929c2e6d8d8cc15933c2",
    "vit_b": "xxh128:6923c33df3637b6a922d7682bfc9a86b",
    "vit_t": "xxh128:8eadbc88aeb9d8c7e0b4b60c3db48bd0",
    "vit_l_lm": "xxh128:017f20677997d628426dec80a8018f9d",
    "vit_b_lm": "xxh128:fe9252a29f3f4ea53c15a06de471e186",
    "vit_t_lm": "xxh128:72ec5074774761a6e5c05a08942f981e",
    "vit_l_em_organelles": "xxh128:810b084b6e51acdbf760a993d8619f2d",
    "vit_b_em_organelles": "xxh128:f3bf2ed83d691456bae2c3f9a05fb438",
    "vit_t_em_organelles": "xxh128:253474720c497cce605e57c9b1d18fd9",
    "vit_b_histopathology": "xxh128:ffd1a2cd84570458b257bd95fdd8f974",
    "vit_l_histopathology": "xxh128:b591833c89754271023e901281dee3f2",
    "vit_h_histopathology": "xxh128:bd1856dafc156a43fb3aa705f1a6e92e",
    "vit_b_medical_imaging": "xxh128:40169f1e3c03a4b67bff58249c176d92",
    "vit_l_lm_decoder": "xxh128:2faeafa03819dfe03e7c46a44aaac64a",
    "vit_b_lm_decoder": "xxh128:708b15ac620e235f90bb38612c4929ba",
    "vit_t_lm_decoder": "xxh128:3e914a5f397b0312cdd36813031f8823",
    "vit_l_em_organelles_decoder": "xxh128:334877640bfdaaabce533e3252a17294",
    "vit_b_em_organelles_decoder": "xxh128:bb6398956a6b0132c26b631c14f95ce2",
    "vit_t_em_organelles_decoder": "xxh128:8f897c7bb93174a4d1638827c4dd6f44",
    "vit_b_histopathology_decoder": "xxh128:6a66194dcb6e36199cbee2214ecf7213",
    "vit_l_histopathology_decoder": "xxh128:46aab7765d4400e039772d5a50b55c04",
    "vit_h_histopathology_decoder": "xxh128:3ed9f87e46ad5e16935bd8d722c8dc47",
    "vit_b_medical_imaging_decoder": "xxh128:9e498b12f526f119b96c88be76e3b2ed",
}

_SAM_BASE = "https://dl.fbaipublicfiles.com/segment_anything/"
_BIOIMAGEIO = "https://uk1s3.embassy.ebi.ac.uk/public-datasets/bioimage.io/"
_MODEL_URLS: Dict[str, str] = {
    "vit_h": _SAM_BASE + "sam_vit_h_4b8939.pth",
    "vit_l": _SAM_BASE + "sam_vit_l_0b3195.pth",
    "vit_b": _SAM_BASE + "sam_vit_b_01ec64.pth",
    "vit_t": "https://owncloud.gwdg.de/index.php/s/TuDzuwVDHd1ZDnQ/download",
    "vit_l_lm": _BIOIMAGEIO + "idealistic-rat/1.2/files/vit_l.pt",
    "vit_b_lm": _BIOIMAGEIO + "diplomatic-bug/1.2/files/vit_b.pt",
    "vit_t_lm": _BIOIMAGEIO + "faithful-chicken/1.1/files/vit_t.pt",
    "vit_l_em_organelles": _BIOIMAGEIO + "humorous-crab/1.2/files/vit_l.pt",
    "vit_b_em_organelles": _BIOIMAGEIO + "noisy-ox/1.2/files/vit_b.pt",
    "vit_t_em_organelles": _BIOIMAGEIO + "greedy-whale/1/files/vit_t.pt",
    "vit_l_lm_decoder": _BIOIMAGEIO + "idealistic-rat/1.2/files/vit_l_decoder.pt",
    "vit_b_lm_decoder": _BIOIMAGEIO + "diplomatic-bug/1.2/files/vit_b_decoder.pt",
    "vit_t_lm_decoder": _BIOIMAGEIO + "faithful-chicken/1.1/files/vit_t_decoder.pt",
    "vit_l_em_organelles_decoder": _BIOIMAGEIO + "humorous-crab/1.2/files/vit_l_decoder.pt",
    "vit_b_em_organelles_decoder": _BIOIMAGEIO + "noisy-ox/1.2/files/vit_b_decoder.pt",
    "vit_t_em_organelles_decoder": _BIOIMAGEIO + "greedy-whale/1/files/vit_t_decoder.pt",
}


def models() -> Dict[str, Dict[str, Optional[str]]]:
    """Model registry: the reference zoo names (micro_sam/util.py:89-181),
    each entry carrying the download url (unusable offline) and the known
    xxh128 hash for local-file validation.

    Checkpoints are torch ``.pt`` files converted on load (models/convert.py).
    """
    registry: Dict[str, Dict[str, Optional[str]]] = {}
    for name in _MODEL_HASHES:
        registry[name] = {
            "url": _MODEL_URLS.get(name), "hash": _MODEL_HASHES[name],
        }
    return registry


def _resolve_cached_model(model_type: str) -> Optional[str]:
    """Locate a pre-seeded zoo checkpoint under <cachedir>/models/<name> and
    validate its content hash (reference downloads via pooch, which validates
    the same xxh128 registry at fetch time)."""
    path = os.path.join(microsam_cachedir(), "models", model_type)
    if not os.path.exists(path):
        return None
    expected = _MODEL_HASHES.get(model_type)
    if expected is not None:
        got = f"xxh128:{_compute_hash(path)}"
        if got != expected:
            raise RuntimeError(
                f"Cached model file {path} is corrupt: hash {got} does not "
                f"match the registry entry {expected}. Delete the file and "
                "re-seed the cache."
            )
    return path


def get_model_names() -> List[str]:
    return list(models().keys())


# -----------------------------------------------------------------------------
# Devices
# -----------------------------------------------------------------------------

def get_device(device: Optional[str] = None):
    """Resolve a jax device. Order: tpu/accelerator -> cpu (util.py:203)."""
    if device is None or device in ("auto",):
        return jax.devices()[0]
    if hasattr(device, "platform"):
        return device
    devs = [d for d in jax.devices() if d.platform == str(device)]
    if not devs:
        try:
            devs = jax.devices(str(device))
        except RuntimeError:
            raise RuntimeError(f"Unsupported device: {device}. Available: "
                               f"{sorted({d.platform for d in jax.devices()})}")
    return devs[0]


def _available_devices() -> List[str]:
    return sorted({d.platform for d in jax.devices()})


# -----------------------------------------------------------------------------
# Model loading
# -----------------------------------------------------------------------------

def _compute_hash(path: str) -> str:
    import xxhash
    h = xxhash.xxh128()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def get_sam_model(
    model_type: str = _DEFAULT_MODEL,
    device: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    return_sam: bool = False,
    return_state: bool = False,
    peft_kwargs: Optional[Dict] = None,
    flexible_load_checkpoint: bool = False,
    compute_dtype: Optional[str] = None,
    seed: int = 0,
    mesh=None,
    decoder_path: Optional[str] = None,
    **kwargs,
) -> Union[SamPredictor, Tuple]:
    """Build a SamPredictor (reference util.py:317).

    If ``checkpoint_path`` points to a torch ``.pt`` / ``.pth`` checkpoint it is
    converted to a JAX pytree; ``.msam`` (numpy ``.npz``) checkpoints saved by
    this framework load directly. Without a checkpoint the model is
    random-initialized (this environment has no download path).

    ``mesh``: a jax.sharding.Mesh with ("data", "model") axes (see
    parallel.mesh.make_mesh). When given, the predictor's compiled programs
    run SPMD over it — encode/decode batches shard the data axis, encoder
    matmuls tensor-shard the model axis — which makes precompute, batched
    inference and AMG multi-chip out of the box.
    """
    _validate_model_type(model_type)
    if compute_dtype is None:
        compute_dtype = "bfloat16" if _on_accelerator() else "float32"

    model_hash = None
    if checkpoint_path is None:
        # pre-seeded zoo cache: <cachedir>/models/<model_type>, hash-validated
        cached = _resolve_cached_model(model_type)
        if cached is not None:
            checkpoint_path = cached
            model_hash = _MODEL_HASHES.get(model_type)

    state: Dict[str, Any] = {}
    decoder_state = None
    if checkpoint_path is not None and os.path.exists(str(checkpoint_path)):
        checkpoint_path = str(checkpoint_path)
        if checkpoint_path.endswith((".npz", ".msam")):
            cfg, params = load_native_checkpoint(checkpoint_path, model_type)
        elif (native := _try_load_native_pickle(checkpoint_path)) is not None:
            # framework-native training checkpoint: pickled dict with a JAX
            # pytree under 'model_state' (SamTrainer.save_checkpoint /
            # export_instance_segmentation_model)
            if "model_config" in native:
                cfg = SamConfig(**{**native["model_config"],
                                   "compute_dtype": compute_dtype})
            else:
                cfg = get_config(native.get("model_type") or model_type, compute_dtype)
            params = jax.tree.map(jnp.asarray, native["model_state"])
            decoder_state = native.get("decoder_state")
        else:
            cfg, params, decoder_state = load_torch_checkpoint(checkpoint_path, model_type)
            from dataclasses import replace
            cfg = replace(cfg, compute_dtype=compute_dtype)
        state["checkpoint_path"] = checkpoint_path
    else:
        if checkpoint_path is not None:
            raise FileNotFoundError(
                f"Checkpoint {checkpoint_path} does not exist and model download "
                "is unavailable in this environment."
            )
        cfg = get_config(model_type, compute_dtype)
        params = init_sam_params(jax.random.PRNGKey(seed), cfg)

    if peft_kwargs:
        from .models.peft_sam import apply_peft
        params = apply_peft(params, cfg, **peft_kwargs)

    sam = Sam(cfg, params)
    predictor = SamPredictor(sam, mesh=mesh)
    predictor.model_type = model_type
    predictor.model_name = model_type
    if model_hash is None and checkpoint_path is not None \
            and os.path.exists(str(checkpoint_path)):
        model_hash = f"xxh128:{_compute_hash(str(checkpoint_path))}"
    predictor._hash = model_hash  # rides the embedding-cache signature

    if decoder_path is not None:
        # separate decoder checkpoint (reference util.py get_sam_model
        # decoder_path): a torch_em UNETR decoder state file
        from .models.unetr import convert_torch_em_decoder
        import torch as _torch
        loaded = _torch.load(str(decoder_path), map_location="cpu",
                             weights_only=False)
        if isinstance(loaded, dict) and "model_state" in loaded:
            loaded = loaded["model_state"]
        decoder_state = loaded

    state["model_state"] = params
    if decoder_state is not None:
        state["decoder_state"] = decoder_state

    if return_sam and return_state:
        return predictor, sam, state
    if return_sam:
        return predictor, sam
    if return_state:
        return predictor, state
    return predictor


def _on_accelerator() -> bool:
    return jax.devices()[0].platform not in ("cpu",)


def _try_load_native_pickle(path: str) -> Optional[Dict[str, Any]]:
    """Load a framework-native training checkpoint (plain pickle holding a
    nested pytree under 'model_state'), or None if the file is a torch
    checkpoint (zip 'PK' magic / legacy tar) or anything else."""
    import pickle
    try:
        with open(path, "rb") as f:
            if f.read(2) == b"PK":  # torch.save zip container
                return None
            f.seek(0)
            state = pickle.load(f)
    except Exception:
        return None
    if (
        isinstance(state, dict)
        and isinstance(state.get("model_state"), dict)
        and "image_encoder" in state["model_state"]
    ):
        return state
    return None


def save_native_checkpoint(path: str, params: dict, config: SamConfig) -> None:
    """Save params as flat npz (this framework's native checkpoint format)."""
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k.startswith("_"):
                    continue
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)
    rec("", params)
    np.savez_compressed(path, __model_type__=np.array(config.model_type), **flat)


def load_native_checkpoint(path: str, model_type: Optional[str] = None):
    data = np.load(path, allow_pickle=False)
    mt = model_type or str(data["__model_type__"])
    cfg = get_config(mt)
    params = init_sam_params(jax.random.PRNGKey(0), cfg)

    def rec(prefix, node):
        if isinstance(node, dict):
            return {k: (v if k.startswith("_") else rec(f"{prefix}/{k}" if prefix else k, v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [rec(f"{prefix}/{i}", v) for i, v in enumerate(node)]
        return jnp.asarray(data[prefix])
    return cfg, rec("", params)


def export_custom_sam_model(
    checkpoint_path: str, model_type: str, save_path: str, with_segmentation_decoder: bool = False,
    prefix: str = "sam.",
) -> None:
    """Export a training checkpoint to a plain torch-layout SAM state dict
    (reference util.py:511), written via torch.save for interoperability.
    ``prefix`` mirrors the reference knob for the key prefix to strip; the
    standard prefixes ("sam.", "model_state") are detected automatically."""
    import torch
    if prefix != "sam.":
        warnings.warn(
            f"Non-default prefix {prefix!r} is ignored: checkpoint key "
            "prefixes are normalized automatically on load.")
    predictor, state = get_sam_model(
        model_type=model_type, checkpoint_path=checkpoint_path, return_state=True
    )
    from .models.convert import export_torch_state_dict
    sd = export_torch_state_dict(predictor.model.params, predictor.model.config)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save(sd, save_path)


# -----------------------------------------------------------------------------
# Image normalization
# -----------------------------------------------------------------------------

def _to_image(input_: np.ndarray) -> np.ndarray:
    """Normalize to (H, W, 3) uint8 (reference util.py:617-650): map channels
    to 3 first, then per-channel min-max to [0, 255] for ALL dtypes — the
    reference normalizes unconditionally, so low-dynamic-range uint8 inputs
    are stretched identically."""
    input_ = np.asarray(input_)
    if input_.ndim == 2:
        input_ = input_[..., None]
    if input_.ndim != 3:
        raise ValueError(f"Invalid image dimensions {input_.shape}")
    if input_.shape[-1] > 3:
        input_ = input_[..., :3]
    if input_.shape[-1] == 1:
        input_ = np.repeat(input_, 3, axis=-1)
    elif input_.shape[-1] == 2:
        input_ = np.concatenate(
            [input_, np.zeros(input_.shape[:2] + (1,), dtype=input_.dtype)], axis=-1
        )

    # same math as the reference (float32, shifted-max epsilon, truncating cast)
    x = input_.astype(np.float32)
    x -= x.min(axis=(0, 1))[None, None]
    x /= x.max(axis=(0, 1))[None, None] + 1e-7
    return np.array((x * 255).astype(np.uint8))


# -----------------------------------------------------------------------------
# Embedding precompute & cache
# -----------------------------------------------------------------------------

def _compute_data_signature(input_: np.ndarray) -> str:
    return hashlib.sha1(np.ascontiguousarray(input_).tobytes()).hexdigest()


def get_block_shape(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Default tile shape heuristic (reference util.py:1377)."""
    ndim = len(shape)
    if ndim == 2:
        return tuple(min(s, 2048) for s in shape)
    return (1,) + tuple(min(s, 2048) for s in shape[1:])


def _tile_grid(shape_2d, tile_shape, halo) -> Blocking:
    return Blocking((0, 0), tuple(shape_2d), tuple(tile_shape))


def _resize_for_encoder(predictor: SamPredictor, image: np.ndarray) -> np.ndarray:
    return predictor._resize_longest_host(_to_image(image))


class _EmbeddingWriter:
    """Thread-pool writer overlapping cache writes with device compute."""

    def __init__(self, enabled: bool):
        self._pool = futures.ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 4)) if enabled else None
        self._futures: List[futures.Future] = []

    def submit(self, fn, *args):
        if self._pool is None:
            fn(*args)
        else:
            self._futures.append(self._pool.submit(fn, *args))

    def finish(self):
        if self._pool is not None:
            for f in self._futures:
                f.result()
            self._pool.shutdown()


def _features_to_cache_layout(feats: jnp.ndarray) -> np.ndarray:
    """(B, 64, 64, 256) NHWC device layout -> (B, 256, 64, 64) reference layout."""
    return np.asarray(jnp.transpose(feats, (0, 3, 1, 2)), dtype=np.float32)


def _encode_batch(predictor: SamPredictor, batch: np.ndarray) -> jnp.ndarray:
    """batch: (B, h, w, 3) resized pixels -> (B, 64, 64, 256).

    Routes through SamPredictor.encode_batch: when the predictor is sharded
    on a device mesh (get_sam_model(..., mesh=...)), every precompute path —
    2d, tiled, 3d, tiled 3d — fans its tile/slice batches out over the mesh
    data axis with no further plumbing here.
    """
    return predictor.encode_batch(batch)


def _embedding_signature(predictor: SamPredictor, input_: np.ndarray,
                         tile_shape, halo) -> Dict[str, Any]:
    sig = {
        "data_signature": _compute_data_signature(input_),
        "model_type": predictor.model_type,
        "model_name": predictor.model_name or predictor.model_type,
        "micro_sam_version": __version__,
        "model_hash": getattr(predictor, "_hash", None),
        "backend": "jax",
    }
    if tile_shape is not None:
        sig["tile_shape"] = list(tile_shape)
        sig["halo"] = list(halo)
    return sig


def _check_saved_embeddings(f, signature: Dict[str, Any]) -> bool:
    """True if cache holds matching, complete embeddings (util.py:1069-1093).

    Completeness follows the reference's contract: a cache is complete once
    ``input_size`` is present in the root attrs (reference util.py:1069-1072
    checks exactly this), so caches written by the upstream framework load
    as-is. Caches written by this framework additionally carry ``done``.
    """
    if "features" not in f:
        return False
    if not (f.attrs.get("done", False) or "input_size" in f.attrs):
        return False
    hard_keys = ("data_signature", "tile_shape", "halo")
    soft_keys = ("model_type", "model_name", "micro_sam_version", "model_hash")
    for key, val in signature.items():
        saved = f.attrs.get(key)
        if saved is None or val is None:
            continue
        if key in hard_keys and saved != val:
            raise RuntimeError(
                f"Embedding cache mismatch for '{key}': got {saved}, expected {val}."
            )
        if key in soft_keys and saved != val:
            warnings.warn(
                f"Embedding cache '{key}' mismatch: {saved} (saved) vs {val} (current)."
            )
    return True


def precompute_image_embeddings(
    predictor: SamPredictor,
    input_: np.ndarray,
    save_path: Optional[str] = None,
    lazy_loading: bool = False,
    ndim: Optional[int] = None,
    tile_shape: Optional[Tuple[int, int]] = None,
    halo: Optional[Tuple[int, int]] = None,
    verbose: bool = True,
    batch_size: int = 1,
    pbar_init=None,
    pbar_update=None,
    mask: Optional[np.ndarray] = None,
    tile_subset: Optional[Sequence[int]] = None,
    finalize: bool = True,
) -> ImageEmbeddings:
    """Compute (or load cached) image embeddings (reference util.py:1132).

    Dispatch: 2d / tiled 2d / 3d / tiled 3d by (ndim, tile_shape). Embeddings
    are cached at ``save_path`` in zarr-v2 layout with signature attrs.

    Multi-host support (parallel.distributed): ``tile_subset`` restricts a
    tiled computation to the given tile ids (each process computes its shard
    and writes its own zarr chunks) and ``finalize=False`` defers the
    signature/done attrs so the coordinating process stamps the cache once
    every shard has landed. Tiled computation also skips tiles whose dataset
    already exists in the cache, which doubles as crash resume.
    """
    ndim = input_.ndim if ndim is None else ndim
    if tile_shape is not None and halo is None:
        halo = tuple(0 for _ in tile_shape)
    if tile_subset is not None and tile_shape is None:
        raise ValueError("tile_subset requires a tiled computation (tile_shape).")

    # MICROSAM_ZARR_FORMAT=3 writes NEW caches in zarr v3 layout so they
    # round-trip with a v3-writing reference install (reference
    # micro_sam/util.py:684-706 picks v2/v3 by the installed zarr version);
    # existing caches keep their format — zarr_lite.open auto-detects.
    zarr_format = int(os.environ.get("MICROSAM_ZARR_FORMAT", "2"))
    if save_path is None:
        f = zarr_lite.open(zarr_lite.MemoryStore(), zarr_format=zarr_format)
    else:
        f = zarr_lite.open(str(save_path), mode="a", zarr_format=zarr_format)

    signature = _embedding_signature(predictor, input_, tile_shape, halo)
    if _check_saved_embeddings(f, signature):
        return _load_cached_embeddings(f, input_, tile_shape, halo, lazy_loading)

    pbar_init, pbar_update, pbar_close = handle_pbar(verbose, pbar_init, pbar_update)

    if ndim == 2 and tile_shape is None:
        embeddings = _compute_2d(predictor, input_, f, batch_size, pbar_init, pbar_update)
    elif ndim == 2:
        embeddings = _compute_tiled_2d(
            predictor, input_, f, tile_shape, halo, batch_size, mask, pbar_init, pbar_update,
            tile_subset=tile_subset, signature=signature,
        )
    elif ndim == 3 and tile_shape is None:
        embeddings = _compute_3d(predictor, input_, f, batch_size, pbar_init, pbar_update)
    elif ndim == 3:
        embeddings = _compute_tiled_3d(
            predictor, input_, f, tile_shape, halo, batch_size, mask, pbar_init, pbar_update,
            tile_subset=tile_subset, signature=signature,
        )
    else:
        raise ValueError(f"Invalid dimensionality {ndim}; expected 2 or 3.")

    if not finalize:
        pbar_close()
        return embeddings

    f.attrs.update(signature)
    f.attrs["input_size"] = list(embeddings["input_size"]) if embeddings["input_size"] else None
    f.attrs["original_size"] = list(embeddings["original_size"]) if embeddings["original_size"] else None
    f.attrs["done"] = True
    pbar_close()
    if lazy_loading and save_path is not None:
        return _load_cached_embeddings(f, input_, tile_shape, halo, lazy_loading)
    return embeddings


def _compute_2d(predictor, input_, f, batch_size, pbar_init, pbar_update) -> ImageEmbeddings:
    pbar_init(1, "compute image embeddings")
    resized = _resize_for_encoder(predictor, input_)
    input_size = tuple(resized.shape[:2])
    original_size = tuple(input_.shape[:2])
    feats = _encode_batch(predictor, resized[None])
    features = _features_to_cache_layout(feats)  # (1, 256, 64, 64)
    f.create_dataset("features", data=features, chunks=features.shape, overwrite=True)
    pbar_update(1)
    return {"features": features, "input_size": input_size, "original_size": original_size}


def _feature_shape(predictor) -> tuple:
    cfg = predictor.model.config
    return (cfg.prompt_embed_dim, cfg.embedding_size, cfg.embedding_size)


def _compute_3d(predictor, input_, f, batch_size, pbar_init, pbar_update) -> ImageEmbeddings:
    n_slices = input_.shape[0]
    C, E, _ = _feature_shape(predictor)
    pbar_init(n_slices, "compute image embeddings for the volume")
    original_size = tuple(input_.shape[1:3])
    input_size = get_preprocess_shape(
        original_size[0], original_size[1], predictor.model.config.img_size
    )

    ds = f.require_dataset(
        "features", shape=(n_slices, 1, C, E, E), chunks=(1, 1, C, E, E),
        dtype="float32",
    )
    writer = _EmbeddingWriter(enabled=True)
    out = np.zeros((n_slices, 1, C, E, E), dtype=np.float32)

    # resume support: skip slices already computed (reference util.py:971-991)
    done_flags = f.attrs.get("slices_done", [])
    done = set(done_flags)

    pending: List[Tuple[int, np.ndarray]] = []

    def flush():
        if not pending:
            return
        idxs = [i for i, _ in pending]
        batch = np.stack([b for _, b in pending])
        feats = _features_to_cache_layout(_encode_batch(predictor, batch))
        for j, i in enumerate(idxs):
            out[i, 0] = feats[j]
            writer.submit(ds.__setitem__, (i, 0), feats[j])
            pbar_update(1)
        pending.clear()

    for z in range(n_slices):
        if z in done:
            out[z] = ds[z]
            pbar_update(1)
            continue
        pending.append((z, _resize_for_encoder(predictor, input_[z])))
        if len(pending) == batch_size:
            flush()
    flush()
    writer.finish()
    f.attrs["slices_done"] = list(range(n_slices))
    return {"features": out, "input_size": input_size, "original_size": original_size}


def _get_tiles_in_mask(blocking: Blocking, mask: Optional[np.ndarray]) -> List[int]:
    if mask is None:
        return list(range(len(blocking)))
    mask = np.asarray(mask)
    keep = []
    for tile_id in range(len(blocking)):
        b = blocking.get_block(tile_id)
        if mask[b.slicing].any():
            keep.append(tile_id)
    return keep


def _restrict_tiles(tile_ids: List[int], tile_subset) -> List[int]:
    if tile_subset is None:
        return tile_ids
    keep = {int(t) for t in tile_subset}
    return [t for t in tile_ids if t in keep]


def _update_group_attrs(group, meta: Dict[str, Any]) -> None:
    """Write group attrs only when they differ — under multi-host precompute
    every process passes here with identical metadata, and skipping the
    redundant rewrite avoids racing on the attrs file."""
    if any(group.attrs.get(k) != v for k, v in meta.items()):
        group.attrs.update(meta)


def _mark_partial_signature(features, signature) -> bool:
    """Record what partial (not-yet-finalized) tiles in this cache belong to;
    returns True when existing tiles carry the same signature and may be
    adopted (multi-host peer shards / crash resume), False when they are
    stale leftovers that must be recomputed. In the multi-host case every
    process writes the identical marker, so the write race is benign."""
    marker = {k: v for k, v in signature.items()}
    stored = features.attrs.get("partial_signature")
    if stored == marker:
        return True
    features.attrs["partial_signature"] = marker
    return False


def _load_existing_tile(features, tile_id: int):
    """Adopt an already-written tile dataset (multi-host shard written by a
    peer process, or a partial previous run): returns the mem entry or None."""
    key = str(tile_id)
    try:
        if key not in features:
            return None
        ds = features[key]
        return {
            "features": ds[...],
            "input_size": tuple(ds.attrs["input_size"]),
            "original_size": tuple(ds.attrs["original_size"]),
        }
    except Exception:
        return None


def _compute_tiled_2d(predictor, input_, f, tile_shape, halo, batch_size, mask,
                      pbar_init, pbar_update, tile_subset=None,
                      signature=None) -> ImageEmbeddings:
    shape_2d = input_.shape[:2]
    blocking = _tile_grid(shape_2d, tile_shape, halo)
    tile_ids = _restrict_tiles(_get_tiles_in_mask(blocking, mask), tile_subset)
    pbar_init(len(tile_ids), "compute tiled image embeddings")

    features = f.require_group("features")
    _update_group_attrs(features, {
        "shape": list(shape_2d), "tile_shape": list(tile_shape), "halo": list(halo),
    })
    adopt_existing = signature is not None and _mark_partial_signature(features, signature)
    writer = _EmbeddingWriter(enabled=True)
    mem: Dict[int, Dict[str, Any]] = {}

    pending: List[Tuple[int, np.ndarray, Tuple[int, int], Tuple[int, int]]] = []

    def flush():
        if not pending:
            return
        hw = pending[0][1].shape[:2]
        batch = np.stack([p[1] for p in pending])
        feats = _features_to_cache_layout(_encode_batch(predictor, batch))
        for j, (tile_id, _, in_size, orig_size) in enumerate(pending):
            tf = feats[j:j + 1]
            mem[tile_id] = {
                "features": tf, "input_size": in_size, "original_size": orig_size,
            }
            def write(tile_id=tile_id, tf=tf, in_size=in_size, orig_size=orig_size):
                ds = features.create_dataset(
                    str(tile_id), data=tf, chunks=tf.shape, overwrite=True
                )
                ds.attrs.update({
                    "input_size": list(in_size), "original_size": list(orig_size),
                })
            writer.submit(write)
            pbar_update(1)
        pending.clear()

    for tile_id in tile_ids:
        existing = _load_existing_tile(features, tile_id) if adopt_existing else None
        if existing is not None:
            mem[tile_id] = existing
            pbar_update(1)
            continue
        tile = blocking.get_block_with_halo(tile_id, halo).outer_block
        tile_input = input_[tile.slicing]
        orig_size = tuple(tile_input.shape[:2])
        resized = _resize_for_encoder(predictor, tile_input)
        in_size = tuple(resized.shape[:2])
        # batch only same-shape tiles together (border tiles differ)
        if pending and pending[-1][1].shape != resized.shape:
            flush()
        pending.append((tile_id, resized, in_size, orig_size))
        if len(pending) == batch_size:
            flush()
    flush()
    writer.finish()
    return {
        "features": mem if mem else features,
        "input_size": None, "original_size": None,
        "tile_shape": tuple(tile_shape), "halo": tuple(halo), "shape": tuple(shape_2d),
    }


def _compute_tiled_3d(predictor, input_, f, tile_shape, halo, batch_size, mask,
                      pbar_init, pbar_update, tile_subset=None,
                      signature=None) -> ImageEmbeddings:
    n_slices = input_.shape[0]
    shape_2d = input_.shape[1:3]
    blocking = _tile_grid(shape_2d, tile_shape, halo)
    tile_ids = _restrict_tiles(
        _get_tiles_in_mask(blocking, None if mask is None else np.max(mask, axis=0)),
        tile_subset)
    C, E, _ = _feature_shape(predictor)
    pbar_init(len(tile_ids) * n_slices, "compute tiled embeddings for the volume")

    features = f.require_group("features")
    _update_group_attrs(features, {
        "shape": list(input_.shape[:3]), "tile_shape": list(tile_shape), "halo": list(halo),
    })
    adopt_existing = signature is not None and _mark_partial_signature(features, signature)
    writer = _EmbeddingWriter(enabled=True)
    mem: Dict[int, Dict[str, Any]] = {}

    for tile_id in tile_ids:
        existing = _load_existing_tile(features, tile_id) if adopt_existing else None
        if existing is not None:
            mem[tile_id] = existing
            pbar_update(n_slices)
            continue
        tile = blocking.get_block_with_halo(tile_id, halo).outer_block
        tile_feats = np.zeros((n_slices, 1, C, E, E), dtype=np.float32)
        in_size = orig_size = None
        batch_buf: List[Tuple[int, np.ndarray]] = []

        def flush():
            nonlocal batch_buf
            if not batch_buf:
                return
            batch = np.stack([b for _, b in batch_buf])
            feats = _features_to_cache_layout(_encode_batch(predictor, batch))
            for j, (z, _) in enumerate(batch_buf):
                tile_feats[z, 0] = feats[j]
                pbar_update(1)
            batch_buf = []

        for z in range(n_slices):
            tile_input = input_[(z,) + tile.slicing]
            orig_size = tuple(tile_input.shape[:2])
            resized = _resize_for_encoder(predictor, tile_input)
            in_size = tuple(resized.shape[:2])
            batch_buf.append((z, resized))
            if len(batch_buf) == batch_size:
                flush()
        flush()

        mem[tile_id] = {"features": tile_feats, "input_size": in_size, "original_size": orig_size}

        def write(tile_id=tile_id, tf=tile_feats, in_size=in_size, orig_size=orig_size):
            ds = features.create_dataset(
                str(tile_id), data=tf, chunks=(1, 1) + tf.shape[2:], overwrite=True
            )
            ds.attrs.update({
                "input_size": list(in_size), "original_size": list(orig_size),
            })
        writer.submit(write)
    writer.finish()
    return {
        "features": mem if mem else features,
        "input_size": None, "original_size": None,
        "tile_shape": tuple(tile_shape), "halo": tuple(halo),
        "shape": tuple(input_.shape[:3]),
    }


def _load_cached_embeddings(f, input_, tile_shape, halo, lazy_loading) -> ImageEmbeddings:
    features = f["features"]
    attrs = f.attrs
    if tile_shape is not None or (not hasattr(features, "shape")):
        # tiled: features is a group of per-tile datasets
        if hasattr(features, "shape"):
            raise RuntimeError("Cache does not contain tiled features.")
        grp_attrs = features.attrs
        emb: ImageEmbeddings = {
            "features": features if lazy_loading else {
                int(k): {
                    "features": features[k][...],
                    "input_size": tuple(features[k].attrs["input_size"]),
                    "original_size": tuple(features[k].attrs["original_size"]),
                } for k in features.keys()
            },
            "input_size": None, "original_size": None,
            "tile_shape": tuple(grp_attrs["tile_shape"]),
            "halo": tuple(grp_attrs["halo"]),
            "shape": tuple(grp_attrs["shape"]),
        }
        return emb
    input_size = attrs.get("input_size")
    original_size = attrs.get("original_size")
    feats = features if lazy_loading else features[...]
    return {
        "features": feats,
        "input_size": tuple(input_size) if input_size else None,
        "original_size": tuple(original_size) if original_size else None,
    }


def _get_tile_features(image_embeddings: ImageEmbeddings, tile_id: int):
    feats = image_embeddings["features"]
    if isinstance(feats, dict):
        return feats[int(tile_id)]
    # lazy zarr group
    ds = feats[str(tile_id)]
    return {
        "features": ds[...],
        "input_size": tuple(ds.attrs["input_size"]),
        "original_size": tuple(ds.attrs["original_size"]),
    }


def set_precomputed(
    predictor: SamPredictor,
    image_embeddings: ImageEmbeddings,
    i: Optional[int] = None,
    tile_id: Optional[int] = None,
) -> SamPredictor:
    """Set precomputed embeddings on the predictor (reference util.py:1214)."""
    if tile_id is not None:
        tile = _get_tile_features(image_embeddings, tile_id)
        if i is None:
            feats = tile["features"]
        else:
            feats = tile["features"][i]
        predictor.set_features(feats, tile["original_size"], tile["input_size"])
        return predictor

    features = image_embeddings["features"]
    if isinstance(features, dict) or not hasattr(features, "ndim"):
        # tiled embeddings: per-tile dict (in-memory) or zarr group (lazy)
        raise ValueError(
            "These are tiled embeddings: pass tile_id to select the tile "
            "(reference util.py:1229 requires the same)."
        )
    if i is not None:
        features = features[i]  # (1, 256, 64, 64) for both numpy and lazy zarr
    features = np.asarray(features)
    predictor.set_features(
        features, image_embeddings["original_size"], image_embeddings["input_size"]
    )
    return predictor


# -----------------------------------------------------------------------------
# Misc utilities (reference util.py:1265-1397)
# -----------------------------------------------------------------------------

def compute_iou(mask1: np.ndarray, mask2: np.ndarray) -> float:
    overlap = np.logical_and(mask1 == 1, mask2 == 1).sum()
    union = np.logical_or(mask1 == 1, mask2 == 1).sum()
    eps = 1e-7
    return float(overlap) / (float(union) + eps)


def get_centers_and_bounding_boxes(
    segmentation: np.ndarray, mode: str = "v"
) -> Tuple[Dict[int, Tuple], Dict[int, Tuple]]:
    """Center coordinates and bounding boxes of all objects (util.py:1282)."""
    from scipy import ndimage
    assert segmentation.ndim == 2
    ids = np.unique(segmentation)
    ids = ids[ids != 0]
    centers = ndimage.center_of_mass(
        np.ones_like(segmentation), segmentation, ids
    ) if len(ids) else []
    center_coordinates = {int(i): tuple(c) for i, c in zip(ids, centers)}
    slices = ndimage.find_objects(segmentation)
    bbox_coordinates = {}
    for i, sl in enumerate(slices, start=1):
        if sl is None:
            continue
        bbox_coordinates[i] = tuple((s.start, s.stop) for s in sl)
    return center_coordinates, bbox_coordinates


def load_image_data(path: str, key: Optional[str] = None, lazy_loading: bool = False):
    """Helper to load image data from file (util.py:1313).

    With ``lazy_loading=True`` the h5py dataset handle is returned (the file
    stays open, as in the reference) so large volumes are not pulled into
    memory up front.
    """
    if key is None:
        import imageio.v3 as imageio
        return imageio.imread(path)
    import h5py
    if lazy_loading:
        fh = h5py.File(path, "r")
        return fh[key]
    with h5py.File(path, "r") as fh:
        data = fh[key][...]
    return data


def segmentation_to_one_hot(
    segmentation: np.ndarray, segmentation_ids: Optional[np.ndarray] = None
) -> np.ndarray:
    """One-hot (N, 1, H, W) float32 masks for the given ids (util.py:1335)."""
    if segmentation_ids is None:
        ids = np.unique(segmentation)
        ids = ids[ids != 0]
    else:
        ids = np.asarray(segmentation_ids)
        matched = np.isin(ids, np.unique(segmentation))
        if not matched.all():
            raise RuntimeError(f"Segmentation ids not found: {ids[~matched]}")
    one_hot = (segmentation[None] == ids[:, None, None]).astype(np.float32)
    return one_hot[:, None]


# -----------------------------------------------------------------------------
# Progress reporting (reference util.py:1097-1129)
# -----------------------------------------------------------------------------

def handle_pbar(verbose: bool, pbar_init=None, pbar_update=None):
    """Returns (pbar_init, pbar_update, pbar_close) callables."""
    if pbar_init is not None and pbar_update is not None:
        return pbar_init, pbar_update, (lambda: None)
    if verbose:
        from tqdm import tqdm
        state = {}

        def init(total, description):
            state["pbar"] = tqdm(total=total, desc=description)

        def update(n=1):
            if "pbar" in state:
                state["pbar"].update(n)

        def close():
            if "pbar" in state:
                state["pbar"].close()
        return init, update, close
    return (lambda total, desc: None), (lambda n=1: None), (lambda: None)


# -----------------------------------------------------------------------------
# Mask records -> instance segmentation, NMS (reference util.py:1568-1827)
# -----------------------------------------------------------------------------

def mask_data_to_segmentation(
    masks: List[Dict[str, Any]],
    shape: Optional[Tuple[int, int]] = None,
    min_object_size: int = 0,
    max_object_size: Optional[int] = None,
    label_masks: bool = True,
    with_background: bool = False,
    merge_exclusively: bool = True,
) -> np.ndarray:
    """Convert mask records (from AMG / batched inference) to an instance
    segmentation by area-sorted exclusive painting (reference util.py:1658).

    Mask records need "segmentation" (binary mask), "area", optionally
    "seg_id", "bbox"+"global_bbox" (XYWH) for tiled predictions.
    """
    from . import native

    def xywh_to_slices(box):
        x, y, w, h = box
        return np.s_[y:y + h, x:x + w]

    def size_ok(area):
        if area < min_object_size:
            return False
        return max_object_size is None or area <= max_object_size

    # paint big objects first so smaller ones can still claim free pixels
    # (exclusive mode) or overwrite on top (non-exclusive mode)
    by_area = sorted(masks, key=lambda rec: rec["area"], reverse=True)
    if shape is None:
        shape = by_area[0]["segmentation"].shape
    canvas = np.zeros(shape, dtype="uint32")

    next_id = 1
    for record in by_area:
        if not size_ok(record["area"]):
            continue
        write_id = record.get("seg_id", next_id)
        binary = np.asarray(record["segmentation"])

        if "global_bbox" in record:
            # tiled prediction: the binary mask lives in the tile frame; its
            # bbox crop is pasted at the image-frame global bbox
            binary = binary[xywh_to_slices(record["bbox"])]
            target = canvas[xywh_to_slices(record["global_bbox"])]
        else:
            target = canvas
        if merge_exclusively:
            binary = binary & (target == 0)
        target[binary] = write_id
        next_id = write_id + 1

    if label_masks:
        canvas = native.label(canvas)

    # drop too-small components and (optionally) the dominant one as
    # background, then compact the label range
    ids, counts = native.unique(canvas, return_counts=True)
    discard = list(ids[counts < min_object_size])
    if with_background:
        discard.append(ids[np.argmax(counts)])
    if discard:
        canvas[native.isin(canvas, np.asarray(discard))] = 0
    return native.relabel_consecutive(canvas)[0]


def _overlap_matrix(boxes: np.ndarray) -> np.ndarray:
    """Pairwise "bounding boxes intersect" matrix for XYXY boxes."""
    x1 = np.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = np.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = np.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = np.minimum(boxes[:, None, 3], boxes[None, :, 3])
    w = np.clip(x2 - x1, 0, None)
    h = np.clip(y2 - y1, 0, None)
    return (w * h) > 0


def _calculate_ious_between_pred_masks(masks, boxes, diagonal_value=1.0):
    """Pairwise mask IoU, restricted to pairs whose boxes overlap
    (reference util.py:1580)."""
    n = masks.shape[0]
    m = np.zeros((n, n), dtype=np.float64)
    overlap_m = _overlap_matrix(boxes)
    masks = np.asarray(masks, dtype=bool)
    for i in range(n):
        js = np.nonzero(overlap_m[i])[0]
        js_half = js[js > i]
        if len(js_half) > 0:
            inter = np.logical_and(masks[i], masks[js_half]).sum(axis=(1, 2))
            union = np.logical_or(masks[i], masks[js_half]).sum(axis=(1, 2))
            m[i, js_half] = inter / np.maximum(union, 1)
    m = m + m.T
    np.fill_diagonal(m, diagonal_value)
    return m


def _calculate_iomin_between_pred_masks(masks, boxes, eps=1e-6):
    """Pairwise intersection-over-min-area via flattened matmul
    (reference util.py:1601)."""
    overlap_m = _overlap_matrix(boxes)
    n = masks.shape[0]
    flat = np.asarray(masks, dtype=np.float32).reshape(n, -1)
    areas = flat.sum(axis=1)
    inter = flat @ flat.T
    min_areas = np.minimum(areas[:, None], areas[None, :])
    iomin = inter / (min_areas + eps)
    iomin[~overlap_m] = 0
    return iomin


def _pairwise_overlap_varshape(masks, offsets, boxes, intersection_over_min,
                               eps=1e-6):
    """Pairwise mask IoU / IoMin for masks living in DIFFERENT local frames
    (tiled predictions whose tiles have unequal shapes — border tiles).

    masks: list of 2d bool arrays; offsets: (N, 2) global (x, y) position of
    each mask's frame origin; boxes: (N, 4) global XYXY mask bboxes. Overlaps
    are evaluated on the bbox-intersection window only, which by construction
    lies inside both frames.
    """
    n = len(masks)
    out = np.eye(n)
    candidates = _overlap_matrix(boxes)
    areas = np.array([int(np.count_nonzero(m)) for m in masks], dtype=np.float64)
    for i in range(n):
        for j in np.nonzero(candidates[i])[0]:
            if j <= i:
                continue
            x1 = int(max(boxes[i, 0], boxes[j, 0]))
            y1 = int(max(boxes[i, 1], boxes[j, 1]))
            x2 = int(min(boxes[i, 2], boxes[j, 2]))
            y2 = int(min(boxes[i, 3], boxes[j, 3]))
            win_i = masks[i][y1 - offsets[i, 1]:y2 - offsets[i, 1],
                             x1 - offsets[i, 0]:x2 - offsets[i, 0]]
            win_j = masks[j][y1 - offsets[j, 1]:y2 - offsets[j, 1],
                             x1 - offsets[j, 0]:x2 - offsets[j, 0]]
            inter = float(np.count_nonzero(win_i & win_j))
            if intersection_over_min:
                denom = min(areas[i], areas[j]) + eps
            else:
                denom = areas[i] + areas[j] - inter + eps
            out[i, j] = out[j, i] = inter / denom
    return out


def _batched_mask_nms(masks, boxes, scores, nms_thresh, intersection_over_min,
                      offsets=None):
    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    if offsets is not None:
        iou_matrix = _pairwise_overlap_varshape(
            masks, offsets, boxes, intersection_over_min)
    elif intersection_over_min:
        masks = np.asarray(masks)
        iou_matrix = _calculate_iomin_between_pred_masks(masks, boxes)
    else:
        masks = np.asarray(masks)
        iou_matrix = _calculate_ious_between_pred_masks(masks, boxes)
    sorted_indices = np.argsort(-scores, kind="stable")
    keep = []
    while len(sorted_indices) > 0:
        i = sorted_indices[0]
        keep.append(int(i))
        if len(sorted_indices) == 1:
            break
        iou_values = iou_matrix[i, sorted_indices[1:]]
        sorted_indices = sorted_indices[1:][iou_values <= nms_thresh]
    return np.asarray(keep, dtype=np.int64)


def apply_nms(
    predictions: List[Dict[str, Any]],
    min_size: int,
    shape: Optional[Tuple[int, int]] = None,
    perform_box_nms: bool = False,
    nms_thresh: float = 0.9,
    max_size: Optional[int] = None,
    intersection_over_min: bool = False,
) -> np.ndarray:
    """Mask/box NMS over prediction records, then merge into an instance
    segmentation (reference util.py:1736)."""
    from .ops.amg_utils import MaskData, batched_nms

    if len(predictions) == 0:
        return np.zeros(shape if shape is not None else (1, 1), dtype="uint32")

    mask_list = [np.asarray(pred["segmentation"]) for pred in predictions]
    uniform = len({m.shape for m in mask_list}) == 1
    data = MaskData(
        # tiled predictions from unequal (border) tiles can't stack; the NMS
        # path below then works on the list with per-mask frame offsets
        masks=np.stack(mask_list) if uniform else mask_list,
        iou_preds=np.array([pred["predicted_iou"] for pred in predictions]),
    )
    data["boxes"] = np.array([pred["bbox"] for pred in predictions])
    data["area"] = [int(np.asarray(m).sum()) for m in data["masks"]]
    data["stability_scores"] = np.array([pred["stability_score"] for pred in predictions])

    is_tiled = "global_bbox" in predictions[0]
    if is_tiled:
        if shape is None:
            raise ValueError("The output shape 'shape' has to be passed for tiled predictions.")
        data["global_boxes"] = np.array([pred["global_bbox"] for pred in predictions])

    if min_size > 0:
        data.filter(np.array([i for i, a in enumerate(data["area"]) if a > min_size], dtype=np.int64))
    if max_size is not None:
        data.filter(np.array([i for i, a in enumerate(data["area"]) if a < max_size], dtype=np.int64))
    if len(data) == 0:
        return np.zeros(shape if shape is not None else predictions[0]["segmentation"].shape,
                        dtype="uint32")

    # Boxes in the records are XYWH; convert for geometric overlap tests.
    def _xywh_to_xyxy(b):
        b = np.asarray(b, dtype=np.float64).copy()
        b[:, 2] += b[:, 0]
        b[:, 3] += b[:, 1]
        return b

    scores = data["iou_preds"] * data["stability_scores"]
    nms_boxes = _xywh_to_xyxy(data["global_boxes"] if is_tiled else data["boxes"])
    if perform_box_nms:
        assert not intersection_over_min  # not implemented
        keep_by_nms = batched_nms(nms_boxes, scores, None, iou_threshold=nms_thresh)
    else:
        # tiled masks live in their tile frames: compare them at GLOBAL
        # coordinates by shifting each mask by its frame offset
        # (global_bbox - local bbox)
        offsets = None
        if is_tiled:
            offsets = (np.asarray(data["global_boxes"])[:, :2]
                       - np.asarray(data["boxes"])[:, :2]).astype(np.int64)
        keep_by_nms = _batched_mask_nms(
            masks=data["masks"], boxes=nms_boxes, scores=scores,
            nms_thresh=nms_thresh, intersection_over_min=intersection_over_min,
            offsets=offsets,
        )
    data.filter(keep_by_nms)

    if is_tiled:
        mask_data = [
            {"segmentation": mask, "area": area, "bbox": box, "global_bbox": global_box}
            for mask, area, box, global_box in zip(
                data["masks"], data["area"], data["boxes"], data["global_boxes"])
        ]
    else:
        mask_data = [
            {"segmentation": mask, "area": area, "bbox": box}
            for mask, area, box in zip(data["masks"], data["area"], data["boxes"])
        ]

    if shape is None:
        shape = predictions[0]["segmentation"].shape
    if mask_data:
        segmentation = mask_data_to_segmentation(mask_data, shape=shape, min_object_size=min_size)
    else:
        segmentation = np.zeros(shape, dtype="uint32")
    return segmentation


def export_custom_qlora_model(
    checkpoint_path: Optional[str],
    finetuned_path: str,
    model_type: str,
    save_path: str,
) -> None:
    """Export a QLoRA-finetuned checkpoint to a LoRA checkpoint usable with
    get_sam_model(peft_kwargs=...) (reference util.py:545): dequantizes the
    bf16 base weights back to float32 and keeps the LoRA parameters."""
    import pickle

    with open(finetuned_path, "rb") as f:
        state = pickle.load(f)
    params = state["model_state"] if "model_state" in state else state

    def dequantize(x):
        arr = np.asarray(x)
        if arr.dtype == np.dtype("bfloat16") or str(arr.dtype) == "bfloat16":
            return arr.astype(np.float32)
        return arr

    params = jax.tree.map(dequantize, params)
    out = {"model_state": params, "model_type": model_type, "peft_module": "lora"}
    with open(save_path, "wb") as f:
        pickle.dump(out, f)
