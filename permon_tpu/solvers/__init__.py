from .mprgp import MPRGPOptions, MPRGPResult, mprgp
from .driver import solve
