from .misc import (  # noqa: F401
    append_dims,
    append_zero,
    default,
    count_params,
    expand_dims_like,
)
