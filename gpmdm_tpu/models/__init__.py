from . import core
from .gpmdm import GPMDM
