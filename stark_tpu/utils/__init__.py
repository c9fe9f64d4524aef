from stark_tpu.utils.xgcd import xgcd

__all__ = ["xgcd"]
