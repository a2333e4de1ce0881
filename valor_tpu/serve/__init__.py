from valor_tpu.serve.engine import EngineOverloaded, InferenceEngine, ServeConfig

__all__ = ["InferenceEngine", "ServeConfig", "EngineOverloaded"]
