"""Pure-numpy OCR kernels (no Spark, no native image libs).

These re-implement, from behavior only, the pipeline stages of the
reference engine (robertknight/ocrs at /root/reference): preprocessing,
detection post-processing, layout analysis, and recognition
pre/post-processing. All are vectorized numpy where the math allows and
plain Python where the reference algorithm is inherently sequential
(per-image greedy layout).
"""
