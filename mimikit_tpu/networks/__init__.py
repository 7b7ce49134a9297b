from .arm import *
from .mlp import *
from .parametrized import *
from .sample_rnn import *
