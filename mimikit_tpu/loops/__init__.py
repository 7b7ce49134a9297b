"""Training / generation loops and their callbacks."""
from .callbacks import *
from .logger import *
from .generate import *
from .train_loops import *
from .beta_scheduler import *
from .device_loader import *
from .streaming import *
