from adaptigraph_tpu.utils.config import Config, load_config, load_yaml
from adaptigraph_tpu.utils import geometry
