"""sqpsolver_tpu.algorithms"""
