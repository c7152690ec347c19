from cutie_tpu.config.config import Config, model_base, model_small, eval_config, get_dataset_cfg

__all__ = ["Config", "model_base", "model_small", "eval_config", "get_dataset_cfg"]
