from incagg_gnn_tpu.ops.spmm import PaddedAdj, spmm, spmm_mean, spmm_max, segment_softmax

__all__ = ["PaddedAdj", "spmm", "spmm_mean", "spmm_max", "segment_softmax"]
