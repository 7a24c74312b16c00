from .init import SimAux, init_cluster
from .step import run_steps, step
