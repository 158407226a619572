from adaptigraph_tpu.dynamics.model import DynamicsPredictor, ModelConfig
