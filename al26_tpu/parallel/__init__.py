from . import ensemble, sharded
