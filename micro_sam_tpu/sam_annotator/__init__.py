"""Interactive annotation tools (napari-based GUI + headless core).

The computational core (state management, layer->prompt conversion,
interactive nd segmentation / tracking drivers, commit logic) is
framework-free and fully usable headless; the napari/Qt widget layer imports
lazily and raises a clear error when napari is not installed (as in this
environment).
"""
from .annotator_2d import annotator_2d
from .annotator_3d import annotator_3d
from .annotator_tracking import annotator_tracking
from .image_series_annotator import image_series_annotator, image_folder_annotator
from ._state import AnnotatorState
