"""sqpsolver_tpu.ops"""
