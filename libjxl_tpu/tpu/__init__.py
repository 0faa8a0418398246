"""TPU-native decode pipeline: the device half of the codec.

The host entropy decoder emits dense per-frame tensors (coefficient
image, dequant weight layout, LLF values, control maps); everything
after tokens — dequant, CfL, all-strategy IDCT, loop filters, XYB→sRGB —
runs as one jitted XLA program (see SURVEY.md §7 guiding split).
"""
