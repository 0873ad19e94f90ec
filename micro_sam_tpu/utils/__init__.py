from .blocking import Blocking, Block, BlockWithHalo
from .transforms import ResizeLongestSide
from . import zarr_lite
