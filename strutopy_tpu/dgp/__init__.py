from strutopy_tpu.dgp.corpus_creation import CorpusCreation

__all__ = ["CorpusCreation"]
