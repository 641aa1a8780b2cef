from vettore_spark.functions import kernels

__all__ = ["kernels"]
