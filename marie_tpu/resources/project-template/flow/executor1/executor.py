from marie_tpu import Executor, requests
from marie_tpu.types.docs import DocumentArray


class MyExecutor(Executor):
    @requests(on="/process")
    def process(self, docs: DocumentArray, **kwargs) -> DocumentArray:
        for doc in docs:
            doc.text = f"processed: {doc.text}"
        return docs
