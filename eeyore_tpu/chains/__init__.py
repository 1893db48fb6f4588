from eeyore_tpu.chains.chain import Chain
from eeyore_tpu.chains.chain_file import ChainFile
from eeyore_tpu.chains.chain_list import ChainList
from eeyore_tpu.chains.chain_lists import ChainLists
from eeyore_tpu.chains.checkpoint import load_state, save_state
