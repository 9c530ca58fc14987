from . import meshio, msh_fields
from .meshio import load, save, guess_format
