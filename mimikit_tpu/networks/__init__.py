from .arm import *
from .mlp import *
from .parametrized import *
from .sample_rnn import *
from .wavenet import *
from .s2s_lstm import *
from .transformers import *
from .tied_autoencoder import *
