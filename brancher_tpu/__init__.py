"""brancher_tpu: a TPU-native probabilistic programming framework.

A from-scratch rebuild of the capabilities of LucaAmbrogioni/Brancher
(symbolic random-variable DSL, SVI, point estimation, particle methods)
re-designed TPU-first: the DAG compiles once into pure JAX closures, and
inference engines (NUTS/HMC, SVI, SMC) are jit/vmap/shard-composed over
device meshes.  See SURVEY.md for the blueprint and BASELINE.json for the
north star.
"""

from .config import RuntimeConfig, config
from .variables import (
    DeterministicVariable,
    PartialLink,
    ProbabilisticModel,
    RandomVariable,
    Variable,
    var2link,
)
from .standard_variables import *  # noqa: F401,F403
from .compiler import CompiledModel, compile_model
from .stochastic_processes import ARProcess, MarkovProcess
from .dashboard import export_dashboard_html
from .model_comparison import compare, loo, waic
from .transformations import (
    PlanarFlow,
    Sigmoid as SigmoidFlow,
    TransformedVariable,
    TriangularLinear,
)

__version__ = "0.1.0"
