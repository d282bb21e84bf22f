from . import nifti, preprocess, sampler, pipeline  # noqa: F401
