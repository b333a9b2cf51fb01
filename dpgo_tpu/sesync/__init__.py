from dpgo_tpu.sesync.init import chordal_initialization, recover_translations_global

__all__ = ["chordal_initialization", "recover_translations_global"]
