from lqp_py_tpu.utils import generators
