from dpgo_tpu.chordal.dchordal import DChordalConfig, distributed_chordal_init

__all__ = ["DChordalConfig", "distributed_chordal_init"]
