"""hipad_tpu: TPU-native end-to-end autonomous driving (HiP-AD capabilities).

Public API surface:

    from hipad_tpu.configs.model import stage1, stage2, tiny
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu import postprocess
    from hipad_tpu.train.train_step import create_train_state, jit_train_step
    from hipad_tpu.agent.core import AgentCore
"""

__version__ = "0.1.0"
