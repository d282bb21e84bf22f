from .convert import (  # noqa: F401
    load_keras_hdf5,
    match_to_model,
    convert_checkpoint,
)
