from pcdms_tpu.utils.tree import cast_pytree, param_count, param_bytes
