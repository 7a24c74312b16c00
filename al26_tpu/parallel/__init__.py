from . import ensemble, ring, sharded
