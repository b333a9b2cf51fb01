from dpgo_tpu.io.g2o import read_g2o_file, Measurements

__all__ = ["read_g2o_file", "Measurements"]
