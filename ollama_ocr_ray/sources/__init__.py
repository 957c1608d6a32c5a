from .io import list_input_files, read_documents, read_documents_files

__all__ = ["list_input_files", "read_documents", "read_documents_files"]
