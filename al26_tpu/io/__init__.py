from . import checkpoint, compat, compression, ubjson, yields_store
