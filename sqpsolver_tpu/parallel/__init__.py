"""sqpsolver_tpu.parallel"""
