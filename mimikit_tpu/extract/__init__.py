"""MIR toolbox: clustering, segmentation, samplify, neighbor scores."""
from .clusters import *
from .segment import *
from .samplify import *
from .from_neighbors import *
