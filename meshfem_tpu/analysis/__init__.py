from . import homogenization
from .homogenization import (homogenize, homogenize_voxels,
                             HomogenizationResult)
