"""Object classifier application (reference
micro_sam/sam_annotator/object_classifier.py).

Headless core: accumulate features + labels over images, train the RF, predict
and project; GUI requires napari.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ._state import AnnotatorState
from ._widgets import _require_napari
from .. import util
from ..object_classification import (
    compute_object_features, project_prediction_to_segmentation,
    run_prediction_with_classifier, train_classifier,
)


def _accumulate_labels(segmentation: np.ndarray, annotations: np.ndarray) -> np.ndarray:
    """Map brush-stroke annotations to per-object majority labels (reference
    object_classifier.py:32)."""
    ids = np.unique(segmentation)
    ids = ids[ids != 0]
    labels = np.zeros(len(ids), dtype="int32")
    for k, oid in enumerate(ids):
        ann = annotations[segmentation == oid]
        ann = ann[ann != 0]
        if len(ann) == 0:
            continue
        vals, counts = np.unique(ann, return_counts=True)
        labels[k] = vals[np.argmax(counts)]
    return labels


class ObjectClassifierWorkflow:
    """Headless object-classification workflow over one or more images."""

    def __init__(self, predictor=None, model_type: str = util._DEFAULT_MODEL):
        self.predictor = predictor or util.get_sam_model(model_type=model_type)
        self.features: List[np.ndarray] = []
        self.labels: List[np.ndarray] = []
        self._current = None  # (seg_ids, features, segmentation)
        self.rf = None

    def set_image(self, image: np.ndarray, segmentation: np.ndarray,
                  embedding_path: Optional[str] = None) -> None:
        emb = util.precompute_image_embeddings(
            self.predictor, image, embedding_path, verbose=False
        )
        seg_ids, feats = compute_object_features(emb, segmentation)
        self._current = (seg_ids, feats, segmentation)

    def add_annotations(self, annotations: np.ndarray) -> int:
        """Accumulate labels from an annotation (brush) layer; returns the
        number of labeled objects added."""
        seg_ids, feats, segmentation = self._current
        labels = _accumulate_labels(segmentation, annotations)
        mask = labels != 0
        self.features.append(feats[mask])
        self.labels.append(labels[mask])
        return int(mask.sum())

    def train_and_predict(self) -> np.ndarray:
        """Train the RF on all accumulated labels, predict the current image
        (reference object_classifier.py:66)."""
        X = np.concatenate(self.features)
        y = np.concatenate(self.labels)
        self.rf = train_classifier(X, y)
        seg_ids, feats, segmentation = self._current
        pred = run_prediction_with_classifier(self.rf, feats)
        return project_prediction_to_segmentation(segmentation, pred.astype(np.uint32), seg_ids)

    def export_rf(self, path: str) -> None:
        import pickle
        with open(path, "wb") as f:
            pickle.dump(self.rf, f)


def object_classifier(image, segmentation, embedding_path=None,
                      model_type: str = util._DEFAULT_MODEL, **kwargs):
    """Start the object-classifier GUI (reference object_classifier.py:312)."""
    _require_napari()
    raise NotImplementedError(
        "The napari object-classifier GUI is pending; use ObjectClassifierWorkflow headless."
    )


def image_series_object_classifier(*args, **kwargs):
    """Series object classification (reference object_classifier.py:392)."""
    _require_napari()
    raise NotImplementedError(
        "The napari object-classifier GUI is pending; use ObjectClassifierWorkflow headless."
    )
