from .torch_pickle import load_torch_pickle  # noqa: F401
