"""Frame-level codec: headers, TOC, frame encode/decode orchestration.

Reference layer L6: lib/jxl/headers.*, image_metadata.*, frame_header.*,
toc.*, dec_frame.*, enc_frame.*.
"""
