"""VarDCT mode: lossy transform coding.

Reference layer L4a: lib/jxl/dct*.{h,cc}, ac_strategy.*,
quant_weights.*, quantizer.*, chroma_from_luma.*, ac_context.h,
coeff_order.*, dec_group.cc, enc_group.cc, compressed_dc.cc.

Host-side (numpy): exact reference transforms, token (de)coding,
tables. Device-side (ops/): batched matmul DCTs and dequant fused
kernels over [blocks, ...] axes for the TPU MXU.
"""
