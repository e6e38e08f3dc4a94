from maskdit_tpu.ops.attention import mha, mha_reference

__all__ = ["mha", "mha_reference"]
