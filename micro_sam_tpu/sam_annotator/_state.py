"""Process-wide annotator state singleton (reference sam_annotator/_state.py).

Holds the predictor, image embeddings, AMG/AIS state, tracking lineage state
and widget references. Framework-free — usable with or without napari.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .. import util as sam_util
from ..instance_segmentation import AMGBase, get_decoder


class Singleton(type):
    """@private"""
    _instances: Dict = {}

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


@dataclass
class AnnotatorState(metaclass=Singleton):
    """Singleton class for the annotation state (reference _state.py:41)."""

    # predictor, image_embeddings and image shape
    image_embeddings: Optional[sam_util.ImageEmbeddings] = None
    predictor: Optional[sam_util.SamPredictor] = None
    image_shape: Optional[Tuple[int, int]] = None
    image_scale: Optional[Tuple[float, ...]] = None
    image_name: Optional[str] = None
    embedding_path: Optional[str] = None
    data_signature: Optional[str] = None

    # automatic segmentation state
    amg: Optional[AMGBase] = None
    amg_state: Optional[Dict] = None
    decoder: Optional[Any] = None

    # tracking state
    current_track_id: Optional[int] = None
    lineage: Optional[Dict] = None
    committed_lineages: Optional[list] = None

    # widget references (populated by the GUI layer)
    widgets: Dict[str, Any] = field(default_factory=dict)
    z_range: Optional[Tuple[int, int]] = None
    skip_recomputing_embeddings: bool = False

    # object classifier state
    object_features: Optional[np.ndarray] = None
    seg_ids: Optional[np.ndarray] = None
    object_rf: Optional[Any] = None
    previous_features: Optional[np.ndarray] = None
    previous_labels: Optional[np.ndarray] = None

    annotator: Optional[Any] = None

    def initialize_predictor(
        self,
        image_data,
        model_type: str,
        ndim: int,
        save_path: Optional[str] = None,
        device=None,
        predictor=None,
        decoder=None,
        checkpoint_path: Optional[str] = None,
        tile_shape: Optional[Tuple[int, int]] = None,
        halo: Optional[Tuple[int, int]] = None,
        precompute_amg_state: bool = False,
        prefer_decoder: bool = True,
        pbar_init=None,
        pbar_update=None,
        skip_load: bool = True,
        use_cli: bool = False,
    ) -> None:
        """Initialize the model and precompute embeddings (reference
        _state.py:87)."""
        assert ndim in (2, 3)

        if predictor is None:
            state = {}
            predictor, state = sam_util.get_sam_model(
                device=device, model_type=model_type,
                checkpoint_path=checkpoint_path, return_state=True,
            )
            if prefer_decoder and "decoder_state" in state:
                decoder = get_decoder(decoder_state=state["decoder_state"], device=device)

        self.predictor = predictor
        self.decoder = decoder
        self.image_embeddings = sam_util.precompute_image_embeddings(
            predictor=self.predictor,
            input_=image_data,
            save_path=save_path,
            ndim=ndim,
            tile_shape=tile_shape,
            halo=halo,
            pbar_init=pbar_init,
            pbar_update=pbar_update,
        )
        self.embedding_path = save_path
        self.data_signature = sam_util._compute_data_signature(np.asarray(image_data))

        if precompute_amg_state:
            from ..precompute_state import cache_amg_state, cache_is_state
            if save_path is None:
                raise RuntimeError(
                    "Precomputation of the AMG state is only possible with a save_path."
                )
            if self.decoder is None:
                self.amg = cache_amg_state(
                    self.predictor, image_data, self.image_embeddings, save_path,
                    verbose=False,
                )
            else:
                self.amg = cache_is_state(
                    self.predictor, self.decoder, image_data, self.image_embeddings,
                    save_path, verbose=False,
                )

    def initialized_for_interactive_segmentation(self) -> bool:
        """Check that predictor and embeddings are initialized (reference
        _state.py:205)."""
        have_predictor = self.predictor is not None
        have_embeddings = self.image_embeddings is not None
        have_shape = self.image_shape is not None
        init_sum = sum((have_predictor, have_embeddings, have_shape))
        if init_sum == 3:
            return True
        if init_sum == 0:
            return False
        raise RuntimeError(
            f"Invalid AnnotatorState: {init_sum} parts initialized, expected 0 or 3."
        )

    def initialized_for_tracking(self) -> bool:
        """Check that the tracking state is initialized (reference _state.py:227)."""
        have_track_id = self.current_track_id is not None
        have_lineage = self.lineage is not None
        init_sum = sum((have_track_id, have_lineage))
        if init_sum == 2:
            return True
        if init_sum == 0:
            return False
        raise RuntimeError(
            f"Invalid AnnotatorState: {init_sum} parts initialized, expected 0 or 2."
        )

    def reset_state(self) -> None:
        """Reset the state (reference _state.py:248)."""
        self.image_embeddings = None
        self.predictor = None
        self.image_shape = None
        self.image_scale = None
        self.image_name = None
        self.embedding_path = None
        self.data_signature = None
        self.amg = None
        self.amg_state = None
        self.decoder = None
        self.current_track_id = None
        self.lineage = None
        self.committed_lineages = None
        self.z_range = None
        self.object_features = None
        self.seg_ids = None
        self.object_rf = None
        self.previous_features = None
        self.previous_labels = None
