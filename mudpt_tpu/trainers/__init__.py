from mudpt_tpu.trainers.base import TrainerBase, build_trainer

# registration via import side effects (mirrors reference train.py:31-40)
from mudpt_tpu.trainers import (  # noqa: F401
    cocoop,
    coop,
    mudpt,
    umudpt,
    uumudpt,
    vpt,
    zsclip,
)

__all__ = ["TrainerBase", "build_trainer"]
