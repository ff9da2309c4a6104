from upsnet_tpu.models.registry import get_model, register_model

__all__ = ["get_model", "register_model"]
