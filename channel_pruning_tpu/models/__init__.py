from channel_pruning_tpu.models.zoo import get_model, MODEL_REGISTRY  # noqa: F401
