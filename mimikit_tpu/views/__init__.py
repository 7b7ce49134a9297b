"""Notebook view layer: config UIs and interactive apps."""
from .factory import *
from .network_views import *
from .train_arm import *
from .dataset import *
from .functionals import *
from .clusters import *
from .io_spec import *
from .segment_selector import *
from .timestamps_selector import *
from .generate_from_checkpoint import *
from .clusterizer_app import *
