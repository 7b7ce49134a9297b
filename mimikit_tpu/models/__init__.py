from .ensemble_generator import *
from .nnn import *
from .patterns import *
