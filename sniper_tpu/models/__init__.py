from sniper_tpu.models.registry import get_model, list_models

__all__ = ["get_model", "list_models"]
