from marie_tpu import Client, Document

if __name__ == "__main__":
    client = Client(port=54321)
    docs = client.post("/process", [Document(text="hello")])
    print(docs[0].text)
