"""sqpsolver_tpu.models"""
