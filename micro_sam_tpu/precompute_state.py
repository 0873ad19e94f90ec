"""Precompute embeddings and AMG/AIS state for later interactive use.

Counterpart of micro_sam/precompute_state.py: pickle-cached AMG states
(``amg_state/state-{i}.pkl``), HDF5-cached AIS decoder maps
(``is_state.h5`` groups ``state-{i}``), and the
``micro_sam_tpu.precompute_embeddings`` CLI.
"""
from __future__ import annotations

import os
import pickle
from functools import partial
from glob import glob
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np

from . import instance_segmentation, util


def cache_amg_state(
    predictor: util.SamPredictor,
    raw: np.ndarray,
    image_embeddings: util.ImageEmbeddings,
    save_path: Union[str, os.PathLike],
    verbose: bool = True,
    i: Optional[int] = None,
    **kwargs,
) -> instance_segmentation.AMGBase:
    """Compute and cache (or load) the AMG state (reference precompute_state.py:27)."""
    is_tiled = image_embeddings["input_size"] is None
    amg = instance_segmentation.get_instance_segmentation_generator(
        predictor, is_tiled=is_tiled, decoder=None, **kwargs
    )

    save_path = str(save_path)
    save_path_amg = os.path.join(save_path, "amg_state")
    os.makedirs(save_path_amg, exist_ok=True)

    save_path_state = os.path.join(
        save_path_amg, "state.pkl" if i is None else f"state-{i}.pkl"
    )

    if os.path.exists(save_path_state):
        if verbose:
            print("Load the AMG state from", save_path_state)
        with open(save_path_state, "rb") as f:
            amg_state = pickle.load(f)
        amg.set_state(amg_state)
        return amg

    if verbose:
        print("Precomputing the state for instance segmentation.")

    amg.initialize(raw, image_embeddings=image_embeddings, i=i, verbose=verbose)
    amg_state = amg.get_state()

    with open(save_path_state, "wb") as f:
        pickle.dump(amg_state, f)
    return amg


def cache_is_state(
    predictor: util.SamPredictor,
    decoder,
    raw: np.ndarray,
    image_embeddings: util.ImageEmbeddings,
    save_path: Union[str, os.PathLike],
    verbose: bool = True,
    i: Optional[int] = None,
    skip_load: bool = False,
    **kwargs,
) -> Optional[instance_segmentation.InstanceSegmentationWithDecoder]:
    """Compute and cache (or load) the AIS state (reference precompute_state.py:90)."""
    import h5py

    is_tiled = image_embeddings["input_size"] is None
    segmenter = instance_segmentation.get_instance_segmentation_generator(
        predictor, is_tiled=is_tiled, decoder=decoder, segmentation_mode="ais", **kwargs
    )

    save_path = os.path.join(str(save_path), "is_state.h5")
    save_key = "state" if i is None else f"state-{i}"

    with h5py.File(save_path, "a") as f:
        if save_key in f:
            if skip_load:
                return
            g = f[save_key]
            state = {
                "foreground": g["foreground"][:],
                "center_distances": g["center_distances"][:],
                "boundary_distances": g["boundary_distances"][:],
            }
            segmenter.set_state(state)
            return segmenter

    if verbose:
        print("Precomputing the state for instance segmentation.")
    segmenter.initialize(raw, image_embeddings=image_embeddings, i=i, verbose=verbose)
    state = segmenter.get_state()

    with h5py.File(save_path, "a") as f:
        g = f.create_group(save_key)
        g.create_dataset("foreground", data=state["foreground"], compression="gzip")
        g.create_dataset("center_distances", data=state["center_distances"], compression="gzip")
        g.create_dataset("boundary_distances", data=state["boundary_distances"], compression="gzip")

    if skip_load:
        return
    return segmenter


def _precompute_state_for_file(
    predictor, input_path, output_path, key, ndim, tile_shape, halo,
    precompute_amg_state, decoder, batch_size: int = 1, verbose: bool = True,
):
    if isinstance(input_path, np.ndarray):
        image_data = input_path
    else:
        image_data = util.load_image_data(input_path, key)

    output_path = Path(output_path).with_suffix(".zarr")
    embeddings = util.precompute_image_embeddings(
        predictor, image_data, str(output_path), ndim=ndim, tile_shape=tile_shape,
        halo=halo, batch_size=batch_size, verbose=verbose,
    )

    if precompute_amg_state:
        cache_state = (
            partial(cache_is_state, decoder=decoder) if decoder is not None else cache_amg_state
        )
        if ndim is None:
            ndim = image_data.ndim
        if ndim == 2:
            cache_state(
                predictor=predictor, raw=image_data, image_embeddings=embeddings,
                save_path=str(output_path), verbose=verbose,
            )
        else:
            for i in range(image_data.shape[0]):
                cache_state(
                    predictor=predictor, raw=image_data[i], image_embeddings=embeddings,
                    save_path=str(output_path), i=i, verbose=verbose,
                )
    return embeddings


def precompute_state(
    input_path: Union[os.PathLike, str],
    output_path: Union[os.PathLike, str],
    pattern: Optional[str] = None,
    model_type: str = util._DEFAULT_MODEL,
    checkpoint_path: Optional[Union[os.PathLike, str]] = None,
    key: Optional[str] = None,
    ndim: Optional[int] = None,
    tile_shape: Optional[Tuple[int, int]] = None,
    halo: Optional[Tuple[int, int]] = None,
    precompute_amg_state: bool = False,
    batch_size: int = 1,
    verbose: bool = True,
) -> None:
    """Precompute the image embeddings and state for one or many files
    (reference precompute_state.py:224)."""
    predictor, state = util.get_sam_model(
        model_type=model_type, checkpoint_path=checkpoint_path, return_state=True
    )
    if "decoder_state" in state:
        decoder = instance_segmentation.get_decoder(decoder_state=state["decoder_state"])
    else:
        decoder = None

    if pattern is None:
        _precompute_state_for_file(
            predictor, input_path, output_path, key, ndim=ndim,
            tile_shape=tile_shape, halo=halo,
            precompute_amg_state=precompute_amg_state, decoder=decoder,
            batch_size=batch_size, verbose=verbose,
        )
    else:
        files = sorted(glob(os.path.join(str(input_path), pattern)))
        os.makedirs(str(output_path), exist_ok=True)
        for file_path in files:
            out_path = os.path.join(str(output_path), f"{Path(file_path).stem}.zarr")
            _precompute_state_for_file(
                predictor, file_path, out_path, key, ndim=ndim,
                tile_shape=tile_shape, halo=halo,
                precompute_amg_state=precompute_amg_state, decoder=decoder,
                batch_size=batch_size, verbose=verbose,
            )


def main():
    """@private CLI: micro_sam_tpu.precompute_embeddings."""
    import argparse

    parser = argparse.ArgumentParser(description="Precompute image embeddings (and optional AMG/AIS state).")
    parser.add_argument("-i", "--input_path", required=True)
    parser.add_argument("-o", "--output_path", required=True)
    parser.add_argument("--pattern", default=None)
    parser.add_argument("-m", "--model_type", default=util._DEFAULT_MODEL)
    parser.add_argument("-c", "--checkpoint_path", default=None)
    parser.add_argument("-k", "--key", default=None)
    parser.add_argument("-n", "--ndim", type=int, default=None)
    parser.add_argument("--tile_shape", nargs="+", type=int, default=None)
    parser.add_argument("--halo", nargs="+", type=int, default=None)
    parser.add_argument("-p", "--precompute_amg_state", action="store_true")
    parser.add_argument("--batch_size", type=int, default=1)

    args = parser.parse_args()
    precompute_state(
        args.input_path, args.output_path, args.pattern, args.model_type,
        args.checkpoint_path, key=args.key, ndim=args.ndim,
        tile_shape=None if args.tile_shape is None else tuple(args.tile_shape),
        halo=None if args.halo is None else tuple(args.halo),
        precompute_amg_state=args.precompute_amg_state, batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
