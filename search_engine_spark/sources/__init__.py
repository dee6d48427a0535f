from .transcripts import TRANSCRIPT_SCHEMA, load_transcripts, validate_transcripts

__all__ = ["TRANSCRIPT_SCHEMA", "load_transcripts", "validate_transcripts"]
