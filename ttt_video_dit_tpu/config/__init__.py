from ttt_video_dit_tpu.config.job_config import JobConfig
from ttt_video_dit_tpu.config.model_config import ModelConfig, VaeModelConfig

__all__ = ["JobConfig", "ModelConfig", "VaeModelConfig"]
