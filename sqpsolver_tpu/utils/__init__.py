"""sqpsolver_tpu.utils"""
