from .batch import *
from .store import *
from .samplers import *
