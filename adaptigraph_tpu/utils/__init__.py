from adaptigraph_tpu.utils.config import Config, load_config, load_yaml
from adaptigraph_tpu.utils.compile_cache import enable_compile_cache
from adaptigraph_tpu.utils import geometry
