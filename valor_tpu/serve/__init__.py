from valor_tpu.serve.engine import InferenceEngine, ServeConfig

__all__ = ["InferenceEngine", "ServeConfig"]
