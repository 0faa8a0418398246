"""libjxl_tpu — a TPU-native JPEG XL codec framework.

Re-implements the capabilities of libjxl (reference: libjxl/libjxl @ 0.13)
with a TPU-first architecture:

  * Host (numpy / C++): container demux, headers, ANS/prefix entropy
    coding, modular token streams, ICC — the branchy byte-oriented layers
    (reference: lib/jxl/dec_bit_reader.h, dec_ans.h, fields.h).
  * TPU (JAX/XLA/Pallas): everything after tokens — batched dequant + IDCT
    over [groups, 256, 256, C] tiles, render-pipeline stages (gaborish,
    EPF, upsampling, XYB→display), encoder DCT/quant/heuristics and
    perceptual metrics (reference: lib/jxl/dec_group.cc,
    lib/jxl/render_pipeline/).

Layer map mirrors SURVEY.md §1; see each subpackage docstring for the
reference files it corresponds to.
"""

__version__ = "0.1.0"
