# Importing this package registers all dataset plugins
# (mirrors the import side effects at reference train.py:15-29).
from mudpt_tpu.data.datasets import (  # noqa: F401
    caltech101,
    dtd,
    eurosat,
    fgvc_aircraft,
    food101,
    imagenet,
    imagenet_variants,
    oxford_flowers,
    oxford_pets,
    stanford_cars,
    sun397,
    synthetic,
    ucf101,
)
