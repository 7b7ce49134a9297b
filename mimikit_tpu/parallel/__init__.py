from .mesh import *
from .serving import *
