"""ptdeco_tpu — TPU-native model compression by low-rank decomposition.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ptdeco
(TCLResearchEurope/ptdeco): the dwain, falor and lockd decomposition
pipelines, re-designed as pure-functional transforms over pytree modules
with jit-compiled calibration/metric steps, data-parallel covariance
accumulation over a device mesh, and checkpoint formats that round-trip
with the reference implementation.
"""

from . import nn  # noqa: F401
from . import utils  # noqa: F401
from . import dwain  # noqa: F401
from . import falor  # noqa: F401
from . import lockd  # noqa: F401
from . import engine  # noqa: F401
from . import finetune  # noqa: F401
from . import parallel  # noqa: F401
from . import serving  # noqa: F401
from . import serving_batcher  # noqa: F401
from . import quant  # noqa: F401
from ._version import __version__, __version_info__  # noqa: F401
