from channel_pruning_tpu.sampling.sampler import (  # noqa: F401
    FrozenCache, make_point_plan, sample_features, sample_patches, freeze,
)
