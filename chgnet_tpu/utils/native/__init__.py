from chgnet_tpu.utils.native.hostops import fast_gather

__all__ = ["fast_gather"]
