from neoplanner_tpu.learn import data, datagen, train

__all__ = ["data", "datagen", "train"]
