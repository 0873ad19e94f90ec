"""Prompt generators for training and evaluation.

Counterpart of micro_sam/prompt_generators.py. Prompt sampling is host-side
numpy (the coordinates then feed the jitted decode); the kornia dilation the
reference uses becomes a scipy binary dilation.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy import ndimage


class PromptGeneratorBase:
    """PromptGeneratorBase is an interface to implement specific prompt generators."""

    def __call__(self, segmentation, prediction=None, bbox_coordinates=None,
                 center_coordinates=None):
        raise NotImplementedError(
            "PromptGeneratorBase is just a class template. "
            "Use a child class that implements the specific generator instead"
        )


class PointAndBoxPromptGenerator(PromptGeneratorBase):
    """Generate point and/or box prompts from an instance segmentation
    (reference prompt_generators.py:58).

    Args:
        n_positive_points: Positive point prompts per mask.
        n_negative_points: Negative point prompts per mask.
        dilation_strength: Dilation of the mask before sampling negatives.
        get_point_prompts: Whether to generate point prompts.
        get_box_prompts: Whether to generate box prompts.
    """

    def __init__(
        self,
        n_positive_points: int,
        n_negative_points: int,
        dilation_strength: int,
        get_point_prompts: bool = True,
        get_box_prompts: bool = False,
        rng: Optional[np.random.RandomState] = None,
    ) -> None:
        self.n_positive_points = n_positive_points
        self.n_negative_points = n_negative_points
        self.dilation_strength = dilation_strength
        self.get_box_prompts = get_box_prompts
        self.get_point_prompts = get_point_prompts
        self._rng = rng or np.random

        if not self.get_point_prompts and not self.get_box_prompts:
            raise ValueError("You need to request box prompts, point prompts or both.")

    def _sample_positive_points(self, object_mask, center_coordinates, coord_list, label_list):
        if center_coordinates is not None:
            coord_list.append(tuple(map(int, center_coordinates)))
            n_positive_remaining = self.n_positive_points - 1
        else:
            n_positive_remaining = self.n_positive_points

        if n_positive_remaining > 0:
            object_coordinates = np.where(object_mask)
            n_coordinates = len(object_coordinates[0])
            indices = self._rng.choice(
                n_coordinates, size=n_positive_remaining,
                replace=n_positive_remaining > n_coordinates,
            )
            coord_list.extend([
                [int(object_coordinates[0][idx]), int(object_coordinates[1][idx])]
                for idx in indices
            ])

        label_list.extend([1] * self.n_positive_points)
        assert len(coord_list) == len(label_list) == self.n_positive_points
        return coord_list, label_list

    def _sample_negative_points(self, object_mask, bbox_coordinates, coord_list, label_list):
        if self.n_negative_points == 0:
            return coord_list, label_list

        # dilated ring around the object, restricted to the (dilated) bbox
        dilated_object = ndimage.binary_dilation(
            object_mask, structure=np.ones((3, 3)), iterations=self.dilation_strength
        )
        background_mask = np.zeros(object_mask.shape, dtype=bool)
        _ds = self.dilation_strength
        background_mask[
            max(bbox_coordinates[0] - _ds, 0): min(bbox_coordinates[2] + _ds, object_mask.shape[-2]),
            max(bbox_coordinates[1] - _ds, 0): min(bbox_coordinates[3] + _ds, object_mask.shape[-1]),
        ] = True
        background_mask = background_mask ^ (background_mask & dilated_object)

        background_coordinates = np.where(background_mask)
        n_coordinates = len(background_coordinates[0])
        if n_coordinates == 0:
            return coord_list, label_list
        indices = self._rng.choice(
            n_coordinates, replace=False,
            size=min(self.n_negative_points, n_coordinates),
        )
        coord_list.extend([
            [int(background_coordinates[0][idx]), int(background_coordinates[1][idx])]
            for idx in indices
        ])
        label_list.extend([0] * len(indices))
        return coord_list, label_list

    def _ensure_num_points(self, object_mask, coord_list, label_list):
        num_points = self.n_positive_points + self.n_negative_points
        if len(coord_list) != num_points:
            needed_points = num_points - len(coord_list)
            more_neg_points = np.where(object_mask == 0)
            indices = self._rng.choice(len(more_neg_points[0]), size=needed_points, replace=False)
            coord_list.extend([
                (int(more_neg_points[0][idx]), int(more_neg_points[1][idx])) for idx in indices
            ])
            label_list.extend([0] * needed_points)
        assert len(coord_list) == len(label_list) == num_points
        return coord_list, label_list

    def _sample_points(self, segmentation, bbox_coordinates, center_coordinates):
        all_coords, all_labels = [], []
        center_coordinates = [None] * len(segmentation) if center_coordinates is None \
            else center_coordinates
        for object_mask, bbox_coords, center_coords in zip(
                segmentation, bbox_coordinates, center_coordinates):
            coord_list, label_list = [], []
            coord_list, label_list = self._sample_positive_points(
                object_mask[0], center_coords, coord_list, label_list)
            coord_list, label_list = self._sample_negative_points(
                object_mask[0], bbox_coords, coord_list, label_list)
            coord_list, label_list = self._ensure_num_points(
                object_mask[0], coord_list, label_list)
            all_coords.append(coord_list)
            all_labels.append(label_list)
        return all_coords, all_labels

    def __call__(
        self,
        segmentation: np.ndarray,           # (NUM_OBJECTS, 1, H, W)
        bbox_coordinates: List[Tuple],
        center_coordinates: Optional[List[np.ndarray]] = None,
        **kwargs,
    ):
        """Returns (point_coords (N, P, 2) xy, point_labels (N, P), boxes (N, 4)
        xyxy, None)."""
        segmentation = np.asarray(segmentation)
        if self.get_point_prompts:
            coord_list, label_list = self._sample_points(
                segmentation, bbox_coordinates, center_coordinates)
            # flip to the (x, y) order SAM expects
            coord_list = np.array(coord_list)[:, :, ::-1].copy()
            label_list = np.array(label_list)
        else:
            coord_list, label_list = None, None

        if self.get_box_prompts:
            bbox_list = np.array(bbox_coordinates)[:, [1, 0, 3, 2]]
        else:
            bbox_list = None
        return coord_list, label_list, bbox_list, None


class IterativePromptGenerator(PromptGeneratorBase):
    """Generate corrective point prompts from prediction-vs-GT differences
    (reference prompt_generators.py:252): one positive point in the
    false-negative region and one negative point in the false-positive region
    per object, with fallbacks for empty regions. 2d and 3d."""

    def __init__(self, rng: Optional[np.random.RandomState] = None):
        self._rng = rng or np.random

    def _get_positive_points(self, pos_region, overlap_region, is_3d):
        positive_locations = [np.where(pos_reg) for pos_reg in pos_region]
        positive_locations = [
            np.where(ovlp_reg) if len(pos_loc[0]) == 0 else pos_loc
            for pos_loc, ovlp_reg in zip(positive_locations, overlap_region)
        ]
        # final fallback: a zero coordinate (degenerate empty object AND empty overlap)
        positive_locations = [
            tuple(np.zeros(1, dtype=np.int64) for _ in pos_loc) if len(pos_loc[0]) == 0 else pos_loc
            for pos_loc in positive_locations
        ]
        sampled_indices = [self._rng.choice(len(pos_loc[0])) for pos_loc in positive_locations]
        if is_3d:
            pos_coordinates = [
                [int(pos_loc[-1][idx]), int(pos_loc[-2][idx]), int(pos_loc[-3][idx])]
                for pos_loc, idx in zip(positive_locations, sampled_indices)
            ]
        else:
            pos_coordinates = [
                [int(pos_loc[-1][idx]), int(pos_loc[-2][idx])]
                for pos_loc, idx in zip(positive_locations, sampled_indices)
            ]
        assert len(pos_coordinates) == pos_region.shape[0]
        return pos_coordinates, [1] * len(pos_coordinates)

    def _get_negative_locations_in_obj_bbox(self, true_object, custom_df=3):
        true_loc = np.where(true_object)
        if len(true_loc[0]) == 0:
            return np.where(true_object == 0)
        bbox = (true_loc[1].min(), true_loc[2].min(), true_loc[1].max() + 1, true_loc[2].max() + 1)
        bbox_mask = np.zeros(true_object.shape[-2:], dtype=bool)
        bbox_mask[
            max(bbox[0] - custom_df, 0): min(bbox[2] + custom_df, true_object.shape[-2]),
            max(bbox[1] - custom_df, 0): min(bbox[3] + custom_df, true_object.shape[-1]),
        ] = True
        background_mask = bbox_mask[None] ^ (bbox_mask[None] & (true_object > 0))
        return np.where(background_mask)

    def _get_negative_points(self, neg_region, true_object, is_3d):
        negative_locations = [np.where(neg_reg) for neg_reg in neg_region]
        negative_locations = [
            self._get_negative_locations_in_obj_bbox(true_obj) if len(neg_loc[0]) == 0 else neg_loc
            for neg_loc, true_obj in zip(negative_locations, true_object)
        ]
        negative_locations = [
            np.where(true_obj == 0) if len(neg_loc[0]) == 0 else neg_loc
            for neg_loc, true_obj in zip(negative_locations, true_object)
        ]
        sampled_indices = [self._rng.choice(len(neg_loc[0])) for neg_loc in negative_locations]
        if is_3d:
            neg_coordinates = [
                [int(neg_loc[-1][idx]), int(neg_loc[-2][idx]), int(neg_loc[-3][idx])]
                for neg_loc, idx in zip(negative_locations, sampled_indices)
            ]
        else:
            neg_coordinates = [
                [int(neg_loc[-1][idx]), int(neg_loc[-2][idx])]
                for neg_loc, idx in zip(negative_locations, sampled_indices)
            ]
        assert len(neg_coordinates) == neg_region.shape[0]
        return neg_coordinates, [0] * len(neg_coordinates)

    def __call__(self, segmentation: np.ndarray, prediction: np.ndarray, **kwargs):
        """segmentation/prediction: (NUM_OBJECTS, 1, [Z,] H, W) float/bool.

        Returns (coords (N, 2, 2|3) xy[z], labels (N, 2), None, None)."""
        segmentation = np.asarray(segmentation)
        prediction = np.asarray(prediction)
        assert segmentation.shape == prediction.shape, \
            "The segmentation and prediction tensors should have the same shape."

        if segmentation.ndim == 5:
            is_3d = True
        elif segmentation.ndim == 4:
            is_3d = False
        else:
            raise ValueError(
                "The segmentation and prediction tensors should have either '4' or '5' dimensions."
            )

        true_object = segmentation.astype(np.float32)
        expected_diff = prediction.astype(np.float32) - true_object
        neg_region = (expected_diff == 1)
        pos_region = (expected_diff == -1)
        overlap_region = np.logical_and(prediction == 1, true_object == 1)

        pos_coordinates, pos_labels = self._get_positive_points(pos_region, overlap_region, is_3d)
        neg_coordinates, neg_labels = self._get_negative_points(neg_region, true_object, is_3d)

        pos_coordinates = np.asarray(pos_coordinates)[:, None]
        neg_coordinates = np.asarray(neg_coordinates)[:, None]
        pos_labels = np.asarray(pos_labels)[:, None]
        neg_labels = np.asarray(neg_labels)[:, None]

        net_coords = np.concatenate([pos_coordinates, neg_coordinates], axis=1)
        net_labels = np.concatenate([pos_labels, neg_labels], axis=1)
        return net_coords, net_labels, None, None
