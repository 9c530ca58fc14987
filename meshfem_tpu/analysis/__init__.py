from . import homogenization
from .homogenization import homogenize, HomogenizationResult
